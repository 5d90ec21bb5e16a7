"""HTTP tagging server with dynamic micro-batching.

The reference's only "serving" story is a subprocess-per-image harness
(``/root/reference/batch_inference_test.py:17-30``).  This module serves the
tagger as a long-lived process around :class:`TaggerEngine`: requests are
queued and coalesced into device-sized batches (up to ``max_batch`` images
or ``batch_timeout_ms``, whichever first), so concurrent clients share one
compiled program at full-batch throughput instead of paying batch-1
dispatches.

Pure-stdlib (http.server + threads): nothing to install on TPU hosts.

Endpoints:
  POST /classify   body = raw image bytes -> per-image JSON in the exact
                   ``classification_results.json`` entry schema
                   (infer/classify.py::_format_results)
  GET  /healthz    liveness + model info
  GET  /tags       the tag vocabulary
"""

from __future__ import annotations

import io
import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np
from PIL import Image

from ..infer.classify import _format_results
from ..infer.engine import TaggerEngine


class _Pending:
    __slots__ = ("pixels", "event", "probs", "error")

    def __init__(self, pixels):
        self.pixels = pixels
        self.event = threading.Event()
        self.probs = None
        self.error: Optional[Exception] = None


class BatchingWorker:
    """Coalesces concurrent classify requests into one device batch."""

    def __init__(self, engine: TaggerEngine, max_batch: int = 8,
                 batch_timeout_ms: float = 10.0,
                 request_timeout_s: float = 600.0):
        self.engine = engine
        self.max_batch = max(1, max_batch)
        self.timeout_s = max(0.0, batch_timeout_ms) / 1000.0
        self.request_timeout_s = request_timeout_s
        self.queue: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._run, daemon=True,
                                       name="tagger-batcher")
        self.thread.start()

    def submit(self, pixels: np.ndarray,
               timeout: Optional[float] = None) -> np.ndarray:
        """(H, W, 3) uint8 -> (num_tags,) probabilities.  Blocking."""
        item = _Pending(pixels)
        self.queue.put(item)
        if not item.event.wait(timeout or self.request_timeout_s):
            raise TimeoutError("classify request timed out")
        if item.error is not None:
            raise item.error
        return item.probs

    def stop(self):
        self._stop.set()
        self.queue.put(None)  # wake the worker
        self.thread.join(timeout=5)

    def _run(self):
        while not self._stop.is_set():
            first = self.queue.get()
            if first is None:
                continue
            batch = [first]
            # drain until the batch is full or the coalescing window closes
            while len(batch) < self.max_batch:
                try:
                    nxt = self.queue.get(timeout=self.timeout_s)
                except queue.Empty:
                    break
                if nxt is None:
                    break
                batch.append(nxt)
            try:
                probs = self.engine.classify(
                    np.stack([b.pixels for b in batch]))
                for item, p in zip(batch, probs):
                    item.probs = np.asarray(p)
            except Exception as e:  # surface to every waiter in the batch
                for item in batch:
                    item.error = e
            finally:
                for item in batch:
                    item.event.set()


def _make_handler(worker: BatchingWorker, engine: TaggerEngine,
                  resolution: int, threshold: float):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet by default
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload, ensure_ascii=False).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok",
                                 "num_tags": len(engine.tag_names),
                                 "resolution": resolution})
            elif self.path == "/tags":
                self._json(200, {"tags": engine.tag_names})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/classify":
                self._json(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                data = self.rfile.read(length)
                # reference inference transform: square distorting BILINEAR
                # resize (modules.py:136-140); normalize happens on device
                img = Image.open(io.BytesIO(data)).convert("RGB")
                pixels = np.asarray(
                    img.resize((resolution, resolution), Image.BILINEAR),
                    dtype=np.uint8)
            except Exception as e:
                self._json(400, {"error": f"bad image: {e}"})
                return
            try:
                probs = worker.submit(pixels)
            except Exception as e:
                self._json(500, {"error": f"inference failed: {e}"})
                return
            self._json(200, _format_results(engine.tag_names, probs,
                                            threshold))

    return Handler


class TaggerServer:
    """Owns the HTTP server + batching worker; ``with`` or serve_forever."""

    def __init__(self, engine: TaggerEngine, resolution: int = 1024,
                 threshold: float = 0.5, host: str = "0.0.0.0",
                 port: int = 8000, max_batch: int = 8,
                 batch_timeout_ms: float = 10.0,
                 request_timeout_s: float = 600.0, warmup: bool = True):
        if warmup:
            # compile the padded device-batch program BEFORE accepting
            # requests: first-compile takes minutes through a remote-compile
            # relay, and a cold server would 500 every early request on its
            # submit timeout while discarding the computed batch
            print(f"warming up the {resolution}px classify program ...")
            engine.classify(np.zeros((1, resolution, resolution, 3),
                                     dtype=np.uint8))
        self.worker = BatchingWorker(engine, max_batch, batch_timeout_ms,
                                     request_timeout_s)
        handler = _make_handler(self.worker, engine, resolution, threshold)
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
