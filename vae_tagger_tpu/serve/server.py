"""HTTP tagging server with dynamic micro-batching.

The reference's only "serving" story is a subprocess-per-image harness
(``/root/reference/batch_inference_test.py:17-30``).  This module serves the
tagger as a long-lived process around :class:`TaggerEngine`: requests are
queued and coalesced into device-sized batches (up to ``max_batch`` images
or ``batch_timeout_ms``, whichever first), so concurrent clients share one
compiled program at full-batch throughput instead of paying batch-1
dispatches.

Robustness (these hosts have 1 CPU core and the server fronts a TPU):
- binds 127.0.0.1 by default — there is no auth; exposing the chip to the
  network is an explicit ``host="0.0.0.0"`` opt-in;
- requests larger than ``max_body_bytes`` are rejected with 413 BEFORE the
  body is read (one oversized upload must not exhaust RAM);
- the batching queue is bounded: when ``max_queue`` requests are already
  waiting, new ones get 503 + Retry-After instead of growing an unbounded
  backlog whose clients will time out anyway (backpressure);
- shutdown fails all queued requests fast instead of leaving their handler
  threads blocked until the request timeout.

Pure-stdlib (http.server + threads): nothing to install on TPU hosts.

Endpoints:
  POST /classify[?resolution=N]
                   body = raw image bytes -> per-image JSON in the exact
                   ``classification_results.json`` entry schema
                   (infer/classify.py::_format_results).  ``resolution``
                   must be one of the server's compiled resolutions.
  GET  /healthz    liveness + model info
  GET  /tags       the tag vocabulary
"""

from __future__ import annotations

import json
import threading
import time
import urllib.parse
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..data.bucketing import decode_bytes_square, decode_bytes_square_yuv
from ..infer.classify import _format_results
from ..infer.engine import TaggerEngine


class QueueFullError(Exception):
    """Raised by submit() when the bounded request queue is full."""


class _Pending:
    __slots__ = ("pixels", "event", "probs", "error", "ts", "t_dispatch",
                 "t_done")

    def __init__(self, pixels):
        self.pixels = pixels
        self.event = threading.Event()
        self.probs = None
        self.error: Optional[Exception] = None
        self.ts = time.monotonic()  # enqueue time: cross-shape FIFO order
        # stamped by the worker: queue->device-batch and batch-completion
        # times, so every response can attribute its latency to queue wait
        # (head-of-line behind older batches) vs device pipeline time
        self.t_dispatch: Optional[float] = None
        self.t_done: Optional[float] = None


class BatchingWorker:
    """Coalesces concurrent classify requests into one device batch.

    Requests are grouped by pixel shape (one compiled program per
    resolution); a bounded total queue applies backpressure across all
    shapes.
    """

    def __init__(self, engine: TaggerEngine, max_batch: int = 8,
                 batch_timeout_ms: float = 10.0,
                 request_timeout_s: float = 600.0,
                 max_queue: int = 64,
                 transfer_format: str = "rgb"):
        self.engine = engine
        self.transfer_format = transfer_format
        self.max_batch = max(1, max_batch)
        self.timeout_s = max(0.0, batch_timeout_ms) / 1000.0
        self.request_timeout_s = request_timeout_s
        self.max_queue = max(1, max_queue)
        # per-shape FIFO queues under one lock/condition: the worker batches
        # same-shape requests together (mixed shapes cannot share a program)
        self._queues: Dict[Tuple[int, ...], deque] = {}
        self._size = 0
        self._cond = threading.Condition()
        self._stop = False
        self._join_timeout = 10.0
        self.thread = threading.Thread(target=self._run, daemon=True,
                                       name="tagger-batcher")
        self.thread.start()

    def submit(self, pixels, timeout: Optional[float] = None,
               want_timing: bool = False):
        """One decoded image -> (num_tags,) probabilities.  Blocking.

        ``pixels`` is (H, W, 3) uint8 in RGB mode, or the planar
        (Y, CbCr) pair in YUV mode (decode_bytes_square_yuv).  Raises
        QueueFullError immediately when max_queue requests are already
        pending (callers translate to 503).  With ``want_timing`` returns
        ``(probs, {"queue_wait_ms", "device_pipeline_ms"})`` — the split
        between time spent queued behind older batches and time from
        device dispatch to batch completion."""
        item = _Pending(pixels)
        shape = (tuple(pixels[0].shape) if isinstance(pixels, tuple)
                 else tuple(pixels.shape))
        with self._cond:
            if self._stop:
                raise RuntimeError("server is shutting down")
            if self._size >= self.max_queue:
                raise QueueFullError(
                    f"request queue full ({self.max_queue} pending)")
            self._queues.setdefault(shape, deque()).append(item)
            self._size += 1
            self._cond.notify()
        wait_s = self.request_timeout_s if timeout is None else timeout
        if not item.event.wait(wait_s):
            # withdraw from the queue so an abandoned request neither holds
            # max_queue capacity nor burns a device batch nobody will read
            with self._cond:
                q = self._queues.get(shape)
                if q is not None:
                    try:
                        q.remove(item)
                        self._size -= 1
                        if not q:
                            del self._queues[shape]
                    except ValueError:
                        pass  # the worker already took it
            raise TimeoutError("classify request timed out")
        if item.error is not None:
            raise item.error
        if want_timing:
            timing = {}
            if item.t_dispatch is not None:
                timing["queue_wait_ms"] = round(
                    (item.t_dispatch - item.ts) * 1000, 1)
                if item.t_done is not None:
                    timing["device_pipeline_ms"] = round(
                        (item.t_done - item.t_dispatch) * 1000, 1)
            return item.probs, timing
        return item.probs

    def stop(self):
        with self._cond:
            self._stop = True
            self._cond.notify_all()
        self.thread.join(timeout=self._join_timeout)
        # fail whatever is still queued so handler threads blocked in
        # submit() return immediately instead of waiting out their timeout
        with self._cond:
            leftovers = [it for q in self._queues.values() for it in q]
            self._queues.clear()
            self._size = 0
        err = RuntimeError("server shut down before the request ran")
        for item in leftovers:
            item.error = err
            item.event.set()

    def _take_batch(self, block: bool = True):
        """Drains up to max_batch SAME-SHAPE items.

        ``block=True`` waits for work (returns None on stop); ``block=False``
        returns [] immediately when nothing is queued (the worker uses it
        while a dispatched batch is still in flight on the device).  The
        coalescing window (timeout_s) only waits when the batch is not yet
        full."""
        with self._cond:
            while self._size == 0:
                if self._stop:
                    return None
                if not block:
                    return []
                self._cond.wait(timeout=0.5)
            # oldest head first (cross-shape FIFO): a minority resolution
            # cannot be starved by a sustained flood of the dominant one —
            # its head reaches the front of the global order after at most
            # one max_batch drain of every younger queue
            shape = min(self._queues, key=lambda s: self._queues[s][0].ts)
            batch = self._pop_shape(shape, self.max_batch)
        deadline = time.monotonic() + self.timeout_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            with self._cond:
                if not self._queues.get(shape):
                    if self._stop:
                        break
                    self._cond.wait(timeout=remaining)
                batch.extend(self._pop_shape(
                    shape, self.max_batch - len(batch)))
        return batch

    def _pop_shape(self, shape, k):
        """Under self._cond: pop up to k items of one shape."""
        q = self._queues.get(shape)
        out = []
        while q and len(out) < k:
            out.append(q.popleft())
            self._size -= 1
        if q is not None and not q:
            del self._queues[shape]
        return out

    def _run(self):
        # One batch stays IN FLIGHT on the device while the next one is
        # assembled and dispatched: jax dispatch is async, so batch N+1's
        # host->device transfer overlaps batch N's compute instead of
        # serializing transfer -> compute -> fetch per batch (measured
        # 24.7 -> see docs/PERF.md under 16 concurrent clients).  With an
        # empty queue the in-flight batch resolves immediately, so a lone
        # request's latency is unchanged.
        inflight = None  # (items, device_probs, real_count)
        while True:
            batch = self._take_batch(block=inflight is None)
            if batch is None:  # stopping: resolve what the device still owes
                if inflight is not None:
                    self._resolve(*inflight)
                return
            dispatched = None
            if batch:
                t_dispatch = time.monotonic()
                for item in batch:
                    item.t_dispatch = t_dispatch
                try:
                    if self.transfer_format == "yuv420":
                        probs, n = self.engine.classify_yuv_async(
                            np.stack([b.pixels[0] for b in batch]),
                            np.stack([b.pixels[1] for b in batch]))
                    else:
                        probs, n = self.engine.classify_async(
                            np.stack([b.pixels for b in batch]))
                    dispatched = (batch, probs, n)
                except Exception as e:  # dispatch failed: fail this batch
                    for item in batch:
                        item.error = e
                        item.event.set()
            if inflight is not None:
                self._resolve(*inflight)
            inflight = dispatched

    @staticmethod
    def _resolve(items, device_probs, real_count):
        """Fetch a dispatched batch's probabilities and wake its waiters."""
        try:
            probs = np.asarray(device_probs)[:real_count]
            for item, p in zip(items, probs):
                item.probs = p
        except Exception as e:  # compute errors surface at fetch time
            for item in items:
                item.error = e
        finally:
            t_done = time.monotonic()
            for item in items:
                item.t_done = t_done
                item.event.set()


def _make_handler(worker: BatchingWorker, engine: TaggerEngine,
                  resolutions: Sequence[int], threshold: float,
                  max_body_bytes: int, transfer_format: str = "rgb"):
    default_resolution = resolutions[0]
    allowed = set(resolutions)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet by default
            pass

        def _json(self, code: int, payload: dict, headers=()):
            body = json.dumps(payload, ensure_ascii=False).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            for k, v in headers:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def _discard_body(self, length: int, cap: int = 256 * 1024 * 1024):
            """Read and throw away up to ``cap`` bytes of an unread body in
            1 MB chunks (never buffered whole); truly enormous bodies
            force-close the connection instead of draining forever."""
            remaining = min(length, cap)
            try:
                while remaining > 0:
                    chunk = self.rfile.read(min(1 << 20, remaining))
                    if not chunk:
                        break
                    remaining -= len(chunk)
            except Exception:
                pass
            if length > cap:
                self.close_connection = True

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok",
                                 "num_tags": len(engine.tag_names),
                                 "resolution": default_resolution,
                                 "resolutions": sorted(allowed)})
            elif self.path == "/tags":
                self._json(200, {"tags": engine.tag_names})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path != "/classify":
                self._json(404, {"error": "unknown path"})
                try:  # drain-before-close invariant (see the 413 path)
                    self._discard_body(
                        int(self.headers.get("Content-Length", "0")))
                except ValueError:
                    pass
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
            except ValueError:
                self._json(400, {"error": "bad Content-Length"})
                return
            if length <= 0:
                self._json(400, {"error": "empty body"})
                return
            resolution = default_resolution
            qs = urllib.parse.parse_qs(parsed.query)
            if "resolution" in qs:
                # every early reject must drain the (never-read) body like
                # the 413 path below, or closing with unread bytes RSTs
                # away the in-flight error response
                try:
                    resolution = int(qs["resolution"][0])
                except ValueError:
                    self._json(400, {"error": "bad resolution"})
                    self._discard_body(length)
                    return
                if resolution not in allowed:
                    self._json(400, {
                        "error": f"resolution {resolution} not served",
                        "resolutions": sorted(allowed)})
                    self._discard_body(length)
                    return
            if length > max_body_bytes:
                # reject BEFORE buffering the body in RAM; then drain it in
                # bounded chunks so the connection closes cleanly — closing
                # with unread bytes in the kernel buffer triggers a TCP RST
                # that can discard the in-flight 413 before the client reads
                # it
                self._json(413, {"error": f"body exceeds "
                                          f"{max_body_bytes} bytes"})
                self._discard_body(length)
                return
            try:
                data = self.rfile.read(length)
                # reference inference transform: square distorting BILINEAR
                # resize — shared bytes-level policy with the file loader
                # (data/bucketing.py::decode_bytes_square; fused native
                # decode when built, GIL-free on the 1-core host; PIL
                # fallback otherwise).  Normalize happens on device.  YUV
                # mode ships planar 4:2:0 (half the device-transfer bytes;
                # RGB reconstituted on device).
                if transfer_format == "yuv420":
                    pixels = decode_bytes_square_yuv(data, resolution)
                else:
                    pixels = decode_bytes_square(data, resolution)
            except Exception as e:
                self._json(400, {"error": f"bad image: {e}"})
                return
            try:
                probs, timing = worker.submit(pixels, want_timing=True)
            except QueueFullError as e:
                self._json(503, {"error": str(e)},
                           headers=[("Retry-After", "1")])
                return
            except Exception as e:
                self._json(500, {"error": f"inference failed: {e}"})
                return
            payload = _format_results(engine.tag_names, probs, threshold)
            # latency attribution (queue wait vs device pipeline), so
            # clients and benches can separate head-of-line queueing from
            # compute without server-side log scraping.  Opt-in via the
            # X-Timing header: the default response body stays exactly the
            # reference's classification_results.json per-image entry
            # schema (tests/test_serve.py pins it).
            if self.headers.get("X-Timing"):
                payload["timing_ms"] = timing
            self._json(200, payload)

    return Handler


class TaggerServer:
    """Owns the HTTP server + batching worker; ``with`` or serve_forever.

    ``resolution`` may be an int or a sequence of ints; the first is the
    default and each one gets its own compiled program (selected per request
    via ``POST /classify?resolution=N``).
    """

    def __init__(self, engine: TaggerEngine, resolution=1024,
                 threshold: float = 0.5, host: str = "127.0.0.1",
                 port: int = 8000, max_batch: int = 8,
                 batch_timeout_ms: float = 10.0,
                 request_timeout_s: float = 600.0, warmup: bool = True,
                 max_body_bytes: int = 32 * 1024 * 1024,
                 max_queue: int = 64, transfer_format: str = "rgb"):
        resolutions = ((resolution,) if isinstance(resolution, int)
                       else tuple(resolution))
        if not resolutions:
            raise ValueError("need at least one resolution")
        if transfer_format not in ("rgb", "yuv420"):
            raise ValueError(f"unknown transfer_format {transfer_format!r}")
        if transfer_format == "yuv420" and any(r % 2 for r in resolutions):
            raise ValueError("yuv420 transfer needs even resolutions")

        def _classify_zeros(b: int, r: int):
            """Warm one (batch, resolution) program in the active format."""
            if transfer_format == "yuv420":
                probs, n = engine.classify_yuv_async(
                    np.zeros((b, r, r), np.uint8),
                    np.zeros((b, 2, r // 2, r // 2), np.uint8))
                np.asarray(probs)
            else:
                engine.classify(np.zeros((b, r, r, 3), dtype=np.uint8))
        self._bg_warmup = None
        if warmup:
            # compile the padded device-batch program(s) BEFORE accepting
            # requests: first-compile takes minutes through a remote-compile
            # relay, and a cold server would 500 every early request on its
            # submit timeout while discarding the computed batch.  The
            # worker coalesces 1..max_batch requests and the engine pads to
            # multiples of engine.pad_multiple(), so every shape in that
            # range can occur.  The two extremes (the smallest padded batch
            # — what light traffic coalesces to — and the full max_batch)
            # are warmed EAGERLY before the port binds; any intermediate
            # multiples warm on a background thread while the server runs,
            # bounding startup at two compiles per resolution regardless of
            # max_batch (a request racing an unwarmed intermediate shape
            # compiles inline — slow once, not a failure).
            mult = getattr(engine, "pad_multiple", lambda: 1)()
            top = -(-max(1, max_batch) // mult) * mult
            sizes = (list(range(mult, top + 1, mult)) if mult > 1
                     else sorted({1, top}))
            eager = [s for s in (sizes[0], sizes[-1]) if s][:len(sizes)]
            eager = sorted(set(eager))
            rest = [s for s in sizes if s not in eager]
            for r in resolutions:
                for b in eager:
                    print(f"warming up the {r}px batch-{b} classify "
                          f"program ...")
                    _classify_zeros(b, r)
            if rest:
                def _warm_rest():
                    for r in resolutions:
                        for b in rest:
                            _classify_zeros(b, r)

                self._bg_warmup = threading.Thread(
                    target=_warm_rest, daemon=True, name="tagger-warmup")
                self._bg_warmup.start()
        self.worker = BatchingWorker(engine, max_batch, batch_timeout_ms,
                                     request_timeout_s, max_queue=max_queue,
                                     transfer_format=transfer_format)
        handler = _make_handler(self.worker, engine, resolutions, threshold,
                                max_body_bytes, transfer_format)
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.port = self.httpd.server_address[1]

    def serve_forever(self):
        print(f"tagger server listening on :{self.port} "
              f"(POST /classify, GET /healthz, GET /tags)")
        try:
            self.httpd.serve_forever()
        finally:
            self.shutdown()

    def start_background(self):
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True,
                             name="tagger-http")
        t.start()
        return t

    def shutdown(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        self.worker.stop()

    def __enter__(self):
        self.start_background()
        return self

    def __exit__(self, *exc):
        self.shutdown()
