"""One-batch-in-flight helper.

jax dispatch is asynchronous: work submitted to the device returns
immediately and only materializing the result (``np.asarray`` /
``jax.device_get``) blocks.  Every batched host↔device loop in this
package therefore wants the same shape — dispatch batch N+1, THEN
materialize/consume batch N — so transfer+compute overlap the host-side
formatting of the previous batch.  This helper is that idiom, shared by
``infer/classify.py``, ``infer/latents.py`` and ``eval/threshold.py``
(the serving worker carries its own variant: its stop/error semantics
are interleaved with a condition variable).
"""

from __future__ import annotations

from typing import Callable


class OneInFlight:
    """Defers ``resolve(*payload)`` by one ``submit`` call.

    >>> pipeline = OneInFlight(resolve)
    >>> for item in items:
    ...     handle = dispatch(item)      # async device work
    ...     pipeline.submit(handle, item)  # resolves the PREVIOUS payload
    >>> pipeline.flush()                 # resolves the last one
    """

    def __init__(self, resolve: Callable):
        self._resolve = resolve
        self._pending = None

    def submit(self, *payload) -> None:
        if self._pending is not None:
            self._resolve(*self._pending)
        self._pending = payload

    def flush(self) -> None:
        if self._pending is not None:
            pending, self._pending = self._pending, None
            self._resolve(*pending)
