"""Overlapped inference decode pipeline (infer/pipeline.py)."""

import numpy as np
import pytest
from PIL import Image

from vae_tagger_tpu.infer.pipeline import iter_image_batches


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(11):
        p = root / f"img_{i:02d}.png"
        Image.fromarray(rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
                        ).save(p)
        paths.append(str(p))
    return paths


def test_batches_preserve_order_and_fullness(image_dir):
    events = list(iter_image_batches(image_dir, resolution=32, batch_size=4,
                                     num_workers=2))
    batches = [e for e in events if e[0] == "batch"]
    assert [len(b[1]) for b in batches] == [4, 4, 3]  # full, full, tail
    flat = [p for b in batches for p in b[1]]
    assert flat == image_dir  # input order preserved
    for _, paths, block in batches:
        assert block.shape == (len(paths), 32, 32, 3)
        assert block.dtype == np.uint8


def test_corrupt_files_dont_occupy_batch_slots(image_dir, tmp_path):
    """A failed decode is reported as an error event and the batch refills —
    every yielded batch except the tail stays full (reference skip-and-
    continue semantics, infer_full.py:99-104)."""
    bad1 = tmp_path / "bad1.png"
    bad1.write_bytes(b"\x89PNG\r\n\x1a\n garbage")
    bad2 = tmp_path / "bad2.jpg"
    bad2.write_bytes(b"\xff\xd8 nope")
    paths = image_dir[:3] + [str(bad1)] + image_dir[3:7] + [str(bad2)] \
        + image_dir[7:]
    events = list(iter_image_batches(paths, resolution=32, batch_size=4,
                                     num_workers=2))
    errors = [e for e in events if e[0] == "error"]
    batches = [e for e in events if e[0] == "batch"]
    assert sorted(e[1] for e in errors) == sorted([str(bad1), str(bad2)])
    assert [len(b[1]) for b in batches] == [4, 4, 3]
    assert [p for b in batches for p in b[1]] == image_dir


def test_matches_serial_decode(image_dir):
    from vae_tagger_tpu.data.bucketing import load_and_transform_image

    got = {}
    for evt in iter_image_batches(image_dir, resolution=32, batch_size=4):
        if evt[0] == "batch":
            for p, img in zip(evt[1], evt[2]):
                got[p] = img
    for p in image_dir:
        np.testing.assert_array_equal(
            got[p], load_and_transform_image(p, resolution=32))


def test_early_exit_does_not_hang(image_dir):
    it = iter_image_batches(image_dir * 10, resolution=32, batch_size=2,
                            prefetch_factor=1)
    next(it)
    it.close()  # generator finalizer must stop the producer thread


def test_empty_input():
    assert list(iter_image_batches([], resolution=32, batch_size=4)) == []
