"""Serving tests: HTTP server + dynamic micro-batching over TaggerEngine.

Drives the full stack in-process: tiny VAE + head artifacts on disk ->
TaggerEngine.load -> TaggerServer on an ephemeral port -> concurrent
urllib clients -> per-image JSON in the classification_results schema.
"""

import concurrent.futures
import io
import json
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from vae_tagger_tpu.core.config import default_flux_vae_config
from vae_tagger_tpu.infer import TaggerEngine
from vae_tagger_tpu.infer.engine import build_decoder
from vae_tagger_tpu.io.safetensors_io import save_vae_pretrained
from vae_tagger_tpu.io.torch_bin import save_decoder_bin
from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL
from vae_tagger_tpu.serve import BatchingWorker, TaggerServer
from vae_tagger_tpu.utils import create_synthetic_dataset

CFG = default_flux_vae_config(block_out_channels=(8, 16, 16, 16),
                              norm_num_groups=4, latent_channels=16,
                              sample_size=64)


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    ds = create_synthetic_dataset(str(root / "ds"), num_images=4,
                                  img_size=64, seed=0)
    model = AutoencoderKL(CFG)
    params = jax.jit(model.init)({"params": jax.random.key(0)},
                                 jnp.zeros((1, 64, 64, 3)),
                                 jax.random.key(1))["params"]
    vae_dir = str(root / "vae")
    save_vae_pretrained(params, CFG, vae_dir)
    decoder = build_decoder(ds["num_tags"], use_attention=True,
                            latent_channels=16)
    variables = jax.jit(decoder.init, static_argnames=("deterministic",))(
        {"params": jax.random.key(2)}, jnp.zeros((1, 8, 8, 16)),
        deterministic=True)
    bin_path = str(root / "decoder.bin")
    save_decoder_bin(variables["params"], variables.get("batch_stats"),
                     bin_path)
    return TaggerEngine.load(
        vae_checkpoint=f"{vae_dir}/diffusion_pytorch_model.safetensors",
        decoder_checkpoint=bin_path,
        tags_csv_path=ds["tags_csv"],
        vae_config_path=f"{vae_dir}/config.json")


def _jpeg_bytes(seed=0):
    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (96, 80, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=90)
    return buf.getvalue()


def test_batching_worker_coalesces_and_matches_direct(engine):
    worker = BatchingWorker(engine, max_batch=4, batch_timeout_ms=30)
    try:
        px = [np.random.default_rng(i).integers(
            0, 255, (64, 64, 3), dtype=np.uint8) for i in range(3)]
        with concurrent.futures.ThreadPoolExecutor(3) as ex:
            probs = list(ex.map(worker.submit, px))
        direct = engine.classify(np.stack(px))
        for got, want in zip(probs, direct):
            np.testing.assert_allclose(got, want, atol=1e-5)
    finally:
        worker.stop()


def test_http_classify_schema_and_health(engine):
    with TaggerServer(engine, resolution=64, threshold=0.0,
                      host="127.0.0.1", port=0, max_batch=4,
                      batch_timeout_ms=5) as server:
        base = f"http://127.0.0.1:{server.port}"

        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.load(r)
        assert health["status"] == "ok"
        assert health["num_tags"] == len(engine.tag_names)

        with urllib.request.urlopen(f"{base}/tags", timeout=30) as r:
            assert json.load(r)["tags"] == engine.tag_names

        req = urllib.request.Request(f"{base}/classify", data=_jpeg_bytes(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.load(r)
        # exact classification_results.json entry schema
        assert set(out) == {"predicted_tags", "total_tags_above_threshold",
                            "max_confidence", "avg_confidence_top5"}
        assert out["total_tags_above_threshold"] == len(out["predicted_tags"])
        confs = [t["confidence"] for t in out["predicted_tags"]]
        assert confs == sorted(confs, reverse=True)
        assert out["predicted_tags"][0]["tag"] in engine.tag_names

        # latency attribution is OPT-IN (X-Timing header) so the default
        # body above stays exactly the reference entry schema; with the
        # header the response adds queue-wait vs device-pipeline stamps
        req = urllib.request.Request(f"{base}/classify", data=_jpeg_bytes(),
                                     method="POST",
                                     headers={"X-Timing": "1"})
        with urllib.request.urlopen(req, timeout=120) as r:
            timed = json.load(r)
        assert set(timed) == {"predicted_tags", "total_tags_above_threshold",
                              "max_confidence", "avg_confidence_top5",
                              "timing_ms"}
        timing = timed["timing_ms"]
        assert set(timing) == {"queue_wait_ms", "device_pipeline_ms"}
        assert timing["queue_wait_ms"] >= 0
        assert timing["device_pipeline_ms"] > 0


def test_http_concurrent_requests_batched(engine):
    with TaggerServer(engine, resolution=64, threshold=0.5,
                      host="127.0.0.1", port=0, max_batch=8,
                      batch_timeout_ms=50) as server:
        base = f"http://127.0.0.1:{server.port}"

        def post(i):
            req = urllib.request.Request(
                f"{base}/classify", data=_jpeg_bytes(i), method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.load(r)

        with concurrent.futures.ThreadPoolExecutor(4) as ex:
            outs = list(ex.map(post, range(4)))
        assert all("predicted_tags" in o for o in outs)


def test_http_bad_image_is_400(engine):
    with TaggerServer(engine, resolution=64, host="127.0.0.1",
                      port=0) as server:
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/classify",
            data=b"not an image", method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400


def test_http_oversized_body_is_413(engine):
    """The 413 JSON must actually reach the client even for a large unread
    body (the server drains it in bounded chunks before closing — closing
    with unread bytes triggers a TCP RST that can destroy the response)."""
    with TaggerServer(engine, resolution=64, host="127.0.0.1", port=0,
                      max_body_bytes=1024) as server:
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/classify",
            data=b"x" * (8 * 1024 * 1024), method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 413
        assert "exceeds" in json.load(ei.value)["error"]


def test_http_multi_resolution_programs(engine):
    with TaggerServer(engine, resolution=(64, 32), threshold=0.0,
                      host="127.0.0.1", port=0, max_batch=2,
                      batch_timeout_ms=5) as server:
        base = f"http://127.0.0.1:{server.port}"
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.load(r)
        assert health["resolution"] == 64
        assert health["resolutions"] == [32, 64]
        for query in ("", "?resolution=32"):
            req = urllib.request.Request(f"{base}/classify{query}",
                                         data=_jpeg_bytes(), method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                out = json.load(r)
            assert "predicted_tags" in out
        req = urllib.request.Request(f"{base}/classify?resolution=999",
                                     data=_jpeg_bytes(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400


class _StallingEngine:
    """engine.classify blocks until released — drives queue-full tests."""

    def __init__(self, num_tags=4):
        threading = __import__("threading")
        self.tag_names = [f"t{i}" for i in range(num_tags)]
        self.release = threading.Event()
        self.entered = threading.Event()  # worker took the first batch

    def classify(self, pixels):
        self.entered.set()
        self.release.wait(timeout=60)
        return np.zeros((pixels.shape[0], len(self.tag_names)), np.float32)

    def classify_async(self, pixels):
        # the pipelined worker dispatches through classify_async; stalling
        # the dispatch keeps these tests' "worker is wedged" semantics
        return self.classify(pixels), pixels.shape[0]


def test_worker_backpressure_queue_full():
    from vae_tagger_tpu.serve import QueueFullError

    stalled = _StallingEngine()
    worker = BatchingWorker(stalled, max_batch=1, batch_timeout_ms=1,
                            max_queue=2)
    try:
        px = np.zeros((8, 8, 3), np.uint8)
        with concurrent.futures.ThreadPoolExecutor(4) as ex:
            import time

            # one request occupies the worker — wait until it is TAKEN
            # off the queue (otherwise the next two could fill the queue
            # first and the third submit would itself see queue-full)
            futs = [ex.submit(worker.submit, px)]
            assert stalled.entered.wait(timeout=30)
            # now two more fill the max_queue=2 queue
            futs += [ex.submit(worker.submit, px) for _ in range(2)]
            time.sleep(0.3)  # let them enqueue
            with pytest.raises(QueueFullError):
                worker.submit(px)
            stalled.release.set()
            for f in futs:
                assert f.result(timeout=60).shape == (4,)
    finally:
        worker.stop()


class _RecordingStallEngine(_StallingEngine):
    """Stalls like _StallingEngine and records the batch shapes it serves."""

    def __init__(self, num_tags=4):
        super().__init__(num_tags)
        self.shapes = []

    def classify(self, pixels):
        self.shapes.append(pixels.shape[1:3])
        return super().classify(pixels)


def test_worker_cross_shape_fifo_no_starvation():
    """Oldest-head-first shape selection: a minority-resolution request
    enqueued BEFORE a flood of the dominant shape is served next, not
    starved behind the larger backlog."""
    import time

    eng = _RecordingStallEngine()
    worker = BatchingWorker(eng, max_batch=2, batch_timeout_ms=1,
                            max_queue=16)
    try:
        a = np.zeros((8, 8, 3), np.uint8)
        b = np.zeros((16, 16, 3), np.uint8)
        with concurrent.futures.ThreadPoolExecutor(8) as ex:
            f0 = ex.submit(worker.submit, a)
            time.sleep(0.3)  # worker takes the first batch and wedges
            fb = ex.submit(worker.submit, b)  # minority shape, enqueued first
            time.sleep(0.1)
            fas = [ex.submit(worker.submit, a) for _ in range(4)]  # flood
            time.sleep(0.3)
            eng.release.set()
            for f in [f0, fb] + fas:
                assert f.result(timeout=60).shape == (4,)
        # batch 0 was the wedged one; the NEXT batch must be the minority
        # shape (its head is the oldest), not the 4-deep dominant backlog
        assert eng.shapes[1] == (16, 16)
    finally:
        worker.stop()


def test_worker_timeout_withdraws_queued_request():
    """A submit() that times out removes its item from the queue: the slot
    frees up for live clients and the worker never burns a batch on it."""
    import time

    stalled = _StallingEngine()
    worker = BatchingWorker(stalled, max_batch=1, batch_timeout_ms=1,
                            max_queue=2)
    try:
        px = np.zeros((8, 8, 3), np.uint8)
        with concurrent.futures.ThreadPoolExecutor(4) as ex:
            f0 = ex.submit(worker.submit, px)
            time.sleep(0.3)  # worker wedges on f0's batch
            f1 = ex.submit(worker.submit, px)  # fills queue slot 1 of 2
            time.sleep(0.2)
            with pytest.raises(TimeoutError):
                worker.submit(px, timeout=0.3)  # queued, then abandoned
            with worker._cond:
                assert worker._size == 1  # the dead item released its slot
            f2 = ex.submit(worker.submit, px)  # must NOT hit QueueFullError
            time.sleep(0.2)
            stalled.release.set()
            for f in (f0, f1, f2):
                assert f.result(timeout=60).shape == (4,)
    finally:
        worker.stop()


def test_worker_stop_fails_pending_fast():
    """stop() with the worker wedged in classify: queued requests fail
    immediately instead of waiting out their 600s request timeout."""
    import time

    stalled = _StallingEngine()
    worker = BatchingWorker(stalled, max_batch=1, batch_timeout_ms=1,
                            request_timeout_s=600, max_queue=8)
    worker._join_timeout = 0.5  # don't wait on the wedged worker in the test
    px = np.zeros((8, 8, 3), np.uint8)
    with concurrent.futures.ThreadPoolExecutor(3) as ex:
        futs = [ex.submit(worker.submit, px)]
        time.sleep(0.3)  # worker takes item 1 and wedges in classify
        futs += [ex.submit(worker.submit, px) for _ in range(2)]
        time.sleep(0.3)  # items 2+3 sit in the queue
        t0 = time.monotonic()
        worker.stop()
        # the two queued-but-never-run requests fail right away
        failed = 0
        for f in futs[1:]:
            with pytest.raises(RuntimeError):
                f.result(timeout=10)
            failed += 1
        assert failed == 2
        assert time.monotonic() - t0 < 10
        stalled.release.set()  # unwedge; request 1 completes normally
        assert futs[0].result(timeout=60).shape == (4,)


class _PipelineProbeEngine:
    """Instant dispatch, fetch blocked until released — proves the worker
    keeps one batch in flight (dispatches batch N+1 before fetching N)."""

    tag_names = ["a", "b"]

    def __init__(self):
        import threading

        self.dispatches = 0
        self.second_queued = threading.Event()  # test: req2 is in the queue
        self.fetch_release = threading.Event()
        engine = self

        class _LazyProbs:
            def __init__(self, n):
                self.n = n

            def __array__(self, dtype=None, copy=None):
                engine.fetch_release.wait(timeout=60)
                return np.zeros((self.n, 2), np.float32)

        self._lazy = _LazyProbs

    def classify_async(self, pixels):
        self.dispatches += 1
        if self.dispatches == 1:
            # hold the first dispatch until the second request is queued so
            # the take-after-dispatch deterministically finds it
            self.second_queued.wait(timeout=60)
        return self._lazy(pixels.shape[0]), pixels.shape[0]


def test_worker_keeps_one_batch_in_flight():
    import concurrent.futures
    import time

    eng = _PipelineProbeEngine()
    worker = BatchingWorker(eng, max_batch=1, batch_timeout_ms=0,
                            request_timeout_s=30)
    px = np.zeros((8, 8, 3), np.uint8)
    try:
        with concurrent.futures.ThreadPoolExecutor(2) as ex:
            f1 = ex.submit(worker.submit, px)
            deadline = time.monotonic() + 5
            while eng.dispatches < 1 and time.monotonic() < deadline:
                time.sleep(0.01)
            assert eng.dispatches == 1
            f2 = ex.submit(worker.submit, px)
            time.sleep(0.1)  # let req2 reach the queue
            eng.second_queued.set()
            # batch 2 must be DISPATCHED while batch 1's fetch is blocked
            deadline = time.monotonic() + 5
            while eng.dispatches < 2 and time.monotonic() < deadline:
                time.sleep(0.01)
            assert eng.dispatches == 2
            assert not f1.done() and not f2.done()
            eng.fetch_release.set()
            assert f1.result(timeout=10).shape == (2,)
            assert f2.result(timeout=10).shape == (2,)
    finally:
        eng.fetch_release.set()
        worker.stop()


def test_http_bad_resolution_with_large_body_gets_the_400(engine):
    """Early-reject paths must drain the unread body like the 413 path:
    closing with megabytes unread RSTs away the in-flight error JSON."""
    with TaggerServer(engine, resolution=64, host="127.0.0.1", port=0,
                      max_body_bytes=32 * 1024 * 1024) as server:
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/classify?resolution=999",
            data=b"x" * (8 * 1024 * 1024), method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
        assert "not served" in json.load(ei.value)["error"]


def test_http_yuv420_transfer_matches_rgb(engine):
    """A yuv420-transfer server returns the same tag ranking as the RGB
    server for the same JPEG (confidences within chroma-resample noise)."""
    data = _jpeg_bytes(seed=7)

    def serve_once(fmt):
        with TaggerServer(engine, resolution=64, threshold=0.0,
                          host="127.0.0.1", port=0, max_batch=4,
                          batch_timeout_ms=5, transfer_format=fmt) as server:
            req = urllib.request.Request(
                f"http://127.0.0.1:{server.port}/classify", data=data,
                method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.load(r)

    rgb = serve_once("rgb")
    yuv = serve_once("yuv420")
    assert set(t["tag"] for t in rgb["predicted_tags"]) == \
        set(t["tag"] for t in yuv["predicted_tags"])
    a = {t["tag"]: t["confidence"] for t in rgb["predicted_tags"]}
    b = {t["tag"]: t["confidence"] for t in yuv["predicted_tags"]}
    for tag in a:
        assert abs(a[tag] - b[tag]) < 0.12  # random JPEG = worst-case chroma


def test_server_rejects_yuv_with_odd_resolution(engine):
    with pytest.raises(ValueError):
        TaggerServer(engine, resolution=63, transfer_format="yuv420",
                     warmup=False, port=0)
