"""Overlapped decode→device pipeline for directory inference.

The reference's inference loop decodes every image inline between device
dispatches (infer_full.py:94-132) — on a 1-core host the TPU idles during
every decode.  This module gives inference the same overlap the training
loader has (data/loader.py): a producer thread decodes+resizes on a thread
pool (PIL and the native C++ decoders both release the GIL) and stages up to
``prefetch_factor`` collated uint8 batches in a bounded queue, so the host
decodes batch N+1 while the device runs batch N.  End-to-end throughput
becomes max(decode, compute) instead of their sum.
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from itertools import islice
from typing import Iterator, Sequence

import numpy as np

from ..data.bucketing import (
    load_and_transform_image,
    load_and_transform_image_yuv,
)


def pad_tail_rows(block, rows: int):
    """Pad a tail batch up to the compiled ``rows`` by repeating the last
    row (results of pad rows are sliced off by the caller).

    This is deliberately done on the host at ``batch_size`` rather than
    left to ``TaggerEngine._pad_batch``: the engine only rounds up to the
    sublane multiple (8 on TPU), so with ``batch_size > 8`` an engine-padded
    tail would be a NEW compiled batch shape — minutes of compile through a
    remote-compile relay for one partial batch.  Repeating to the already
    compiled shape reuses the hot program.

    Accepts either a single array or a tuple of arrays sharing a leading
    batch dim (the YUV path's (Y, CbCr) pair)."""
    if isinstance(block, tuple):
        return tuple(pad_tail_rows(b, rows) for b in block)
    n = block.shape[0]
    if n >= rows:
        return block
    return np.concatenate(
        [block, np.repeat(block[-1:], rows - n, axis=0)], axis=0)


def iter_image_batches(image_paths: Sequence, resolution: int,
                       batch_size: int, num_workers: int = 4,
                       prefetch_factor: int = 2,
                       pixel_format: str = "rgb") -> Iterator[tuple]:
    """Decode images on a thread pool, yielding batches a queue ahead.

    Yields, in input order:
      ("batch", [paths], (n, H, W, 3) uint8)  with 1 <= n <= batch_size
      ("error", path, exception)              for undecodable images

    With ``pixel_format='yuv420'`` each batch payload is instead the planar
    pair ((n, H, W) luma, (n, 2, H/2, W/2) chroma) — half the bytes of RGB;
    the engine reconstitutes RGB on device (classify_yuv_async).

    Failed decodes never occupy a batch slot — every yielded batch except
    the last is full (matches the reference's skip-and-continue semantics,
    infer_full.py:99-104).
    """
    if pixel_format not in ("rgb", "yuv420"):
        raise ValueError(f"unknown pixel_format {pixel_format!r}")
    yuv = pixel_format == "yuv420"
    out_q: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch_factor))
    stop = threading.Event()

    def load(p):
        try:
            if yuv:
                return p, load_and_transform_image_yuv(
                    str(p), resolution=resolution), None
            return p, load_and_transform_image(str(p),
                                               resolution=resolution), None
        except Exception as e:
            return p, None, e

    def stack(items):
        if yuv:
            return (np.stack([t[0] for t in items]),
                    np.stack([t[1] for t in items]))
        return np.stack(items)

    def safe_put(item) -> bool:
        # never block forever: the consumer may have exited early
        while not stop.is_set():
            try:
                out_q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            imgs, paths = [], []
            it = iter(image_paths)
            # a sliding window of in-flight decode futures, consumed in
            # submit (= input) order: no per-batch barrier, so one slow
            # decode (a big PNG among JPEGs) never idles the other workers,
            # and decoding continues while a finished batch is stacked and
            # queued.  The window bounds decoded-image memory.
            inflight = deque()
            window = max(1, num_workers) + batch_size

            with ThreadPoolExecutor(max(1, num_workers)) as pool:
                def top_up():
                    while len(inflight) < window:
                        nxt = list(islice(it, 1))
                        if not nxt:
                            return
                        inflight.append(pool.submit(load, nxt[0]))

                top_up()
                while inflight:
                    p, img, err = inflight.popleft().result()
                    top_up()
                    if err is not None:
                        if not safe_put(("error", str(p), err)):
                            return
                        continue
                    imgs.append(img)
                    paths.append(str(p))
                    if len(imgs) == batch_size:
                        if not safe_put(("batch", paths, stack(imgs))):
                            return
                        imgs, paths = [], []
            if imgs and not safe_put(("batch", paths, stack(imgs))):
                return
            safe_put(None)
        except BaseException as e:  # surface in the consumer, don't hang
            safe_put(e)

    thread = threading.Thread(target=producer, daemon=True,
                              name="infer-prefetch")
    thread.start()
    try:
        while True:
            evt = out_q.get()
            if evt is None:
                break
            if isinstance(evt, BaseException):
                raise evt
            yield evt
    finally:
        stop.set()
        # drain so a blocked producer can exit
        while thread.is_alive():
            try:
                out_q.get_nowait()
            except queue.Empty:
                break
