"""EpochLoop checkpoint-writer semantics (the trainer e2e tests exercise the
full async path end-to-end: single-process runs route on_best/on_periodic
through _CheckpointWriter by default, and the resume test restores a
checkpoint the async writer saved)."""

import threading
import time

import pytest

from vae_tagger_tpu.train.loop import _CheckpointWriter


def test_writer_serializes_fifo():
    w = _CheckpointWriter()
    order = []
    started = threading.Event()

    def slow(tag):
        started.set()
        time.sleep(0.05)
        order.append(tag)

    w.submit(slow, "a")
    started.wait(timeout=5)
    w.submit(slow, "b")  # must wait for "a" to finish first
    w.wait()
    assert order == ["a", "b"]


def test_writer_surfaces_errors_on_next_submit():
    w = _CheckpointWriter()

    def boom(_):
        raise RuntimeError("disk full")

    w.submit(boom, None)
    with pytest.raises(RuntimeError, match="disk full"):
        w.submit(lambda _: None, None)
    # the failed write was consumed; the writer stays usable
    done = []
    w.submit(done.append, "ok")
    w.wait()
    assert done == ["ok"]


def test_writer_wait_is_idempotent():
    w = _CheckpointWriter()
    w.submit(lambda: None)
    w.wait()
    w.wait()  # nothing pending: no-op, no error


def test_one_in_flight_defers_exactly_one():
    from vae_tagger_tpu.utils.pipelining import OneInFlight

    out = []
    p = OneInFlight(lambda *a: out.append(a))
    p.submit(1, "a")
    assert out == []  # first payload stays in flight
    p.submit(2, "b")
    assert out == [(1, "a")]  # resolved by the next submit
    p.flush()
    assert out == [(1, "a"), (2, "b")]
    p.flush()  # idempotent
    assert out == [(1, "a"), (2, "b")]
