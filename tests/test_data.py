"""Data layer tests: label parsing, bucketing, sampler, loader, synthetic
fixture round trip."""

import json

import numpy as np
import pytest

from vae_tagger_tpu.data.bucketing import AspectRatioBucketing, SmartResize
from vae_tagger_tpu.data.dataset import TaggedImageDataset, parse_weighted_tags
from vae_tagger_tpu.data.loader import (
    BucketBatchSampler,
    DataLoader,
    train_val_split,
)
from vae_tagger_tpu.utils import create_synthetic_dataset


@pytest.fixture(scope="module")
def fixture_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    out = str(root / "test_dataset")
    info = create_synthetic_dataset(out, num_images=16, img_size=64, seed=0)
    return out, info


def test_parse_weighted_tags():
    tag_to_idx = {"a": 0, "b": 1, "c": 2}
    v = parse_weighted_tags("a:1.0, b:0.8, unknown:2.0", tag_to_idx, 3)
    np.testing.assert_allclose(v, [1.0, 0.8, 0.0])
    # no weight defaults to 1.0; malformed weight defaults to 1.0
    v = parse_weighted_tags("c, b:oops", tag_to_idx, 3)
    np.testing.assert_allclose(v, [0.0, 1.0, 1.0])
    # single label without comma
    v = parse_weighted_tags("b:0.5", tag_to_idx, 3)
    np.testing.assert_allclose(v, [0.0, 0.5, 0.0])


def test_bucket_generation_bounds():
    """Buckets: W,H in [512,1024] step 64 with W*H <= 1024^2
    (modules.py:188-197)."""
    b = AspectRatioBucketing(512, 1024, 64)
    assert (512, 512) in b.buckets
    assert (1024, 1024) in b.buckets
    assert (1024, 1088) not in b.buckets
    for w, h in b.buckets:
        assert 512 <= w <= 1024 and 512 <= h <= 1024
        assert w * h <= 1024 * 1024
        assert w % 64 == 0 and h % 64 == 0
    # closest-aspect assignment
    assert b.assign_bucket_for_size(2048, 1024)[0] > \
        b.assign_bucket_for_size(2048, 1024)[1]
    assert b.assign_bucket_for_size(1000, 1000) == (512, 512) or \
        b.assign_bucket_for_size(1000, 1000)[0] == \
        b.assign_bucket_for_size(1000, 1000)[1]


def test_smart_resize_shapes():
    from PIL import Image

    img = Image.new("RGB", (200, 100), (255, 0, 0))
    out = SmartResize(64, 64)(img)
    assert out.size == (64, 64)
    out = SmartResize(128, 64)(img)
    assert out.size == (128, 64)


def test_dataset_items(fixture_dataset):
    out, info = fixture_dataset
    ds = TaggedImageDataset(
        json_path=f"{out}/data.json", tags_csv_path=f"{out}/tags.csv",
        resolution=64, seed=0)
    assert len(ds) == 16
    item = ds[0]
    # triplet mode ships the anchor once (no duplicate pixel_values copy);
    # classification mode (return_triplets=False) provides pixel_values
    assert "pixel_values" not in item
    assert item["labels"].shape == (info["num_tags"],)
    for key in ("anchor", "positive", "negative"):
        assert item[key].shape == (64, 64, 3)
        assert item[key].dtype == np.uint8
    # positives share at least one tag unless fallback to anchor
    assert (item["labels"] * item["positive_labels"]).sum() > 0
    # class distribution matches the label matrix
    dist = ds.class_distribution()
    assert dist.sum() == (ds.labels_matrix > 0).sum()


def test_sampler_constant_batch_and_mask(fixture_dataset):
    out, _ = fixture_dataset
    ds = TaggedImageDataset(
        json_path=f"{out}/data.json", tags_csv_path=f"{out}/tags.csv",
        resolution=64, return_triplets=False, seed=0)
    sampler = BucketBatchSampler(ds, batch_size=5, shuffle=True, seed=0)
    batches = list(sampler)
    assert len(batches) == len(sampler) == 4  # ceil(16/5)
    seen = []
    for indices, mask in batches:
        assert len(indices) == 5 and len(mask) == 5
        seen.extend(i for i, m in zip(indices, mask) if m)
    assert sorted(seen) == list(range(16))  # every sample exactly once


def test_loader_batches(fixture_dataset):
    out, info = fixture_dataset
    ds = TaggedImageDataset(
        json_path=f"{out}/data.json", tags_csv_path=f"{out}/tags.csv",
        resolution=64, return_triplets=False, seed=0)
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 4
    b = batches[0]
    assert b["pixel_values"].shape == (4, 64, 64, 3)
    assert b["labels"].shape == (4, info["num_tags"])
    assert b["batch_mask"].all()


def test_train_val_split():
    train, val = train_val_split(20, 0.1, seed=42)
    assert len(val) == 2 and len(train) == 18
    assert sorted(train + val) == list(range(20))
    # tiny dataset still gets one val sample
    train, val = train_val_split(3, 0.1, seed=42)
    assert len(val) == 1


def test_fixture_format(fixture_dataset):
    out, info = fixture_dataset
    with open(f"{out}/data.json") as f:
        data = json.load(f)
    assert len(data) == 16
    sample = next(iter(data.values()))
    assert ":" in sample  # weighted tag string format
    import pandas as pd

    df = pd.read_csv(f"{out}/tags.csv")
    assert "name" in df.columns and "count" in df.columns


def test_multihost_loader_slicing(fixture_dataset):
    """Simulated 2-process loading: identical global batch sequence, each
    process takes a contiguous half, counts/shapes/real-counts agree."""
    out, info = fixture_dataset
    ds = TaggedImageDataset(
        json_path=f"{out}/data.json", tags_csv_path=f"{out}/tags.csv",
        resolution=64, return_triplets=False, seed=0)
    loaders = [DataLoader(ds, batch_size=4, shuffle=True, num_workers=1,
                          seed=7, process_index=p, process_count=2)
               for p in (0, 1)]
    b0 = list(loaders[0])
    b1 = list(loaders[1])
    assert len(b0) == len(b1) == len(loaders[0])
    for a, b in zip(b0, b1):
        assert a["pixel_values"].shape == b["pixel_values"].shape == (2, 64, 64, 3)
        # global real count identical across processes
        assert int(a["global_real_count"]) == int(b["global_real_count"])
        # disjoint halves of the same global batch
        assert set(a["index"]).isdisjoint(set(b["index"])) or \
            not (a["batch_mask"].all() and b["batch_mask"].all())


def test_loader_early_exit_no_leak(fixture_dataset):
    """Breaking out of iteration must not leave the producer thread alive."""
    import threading

    out, _ = fixture_dataset
    ds = TaggedImageDataset(
        json_path=f"{out}/data.json", tags_csv_path=f"{out}/tags.csv",
        resolution=64, return_triplets=False, seed=0)
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1,
                        prefetch_factor=1)
    before = threading.active_count()
    for i, batch in enumerate(loader):
        break  # early exit after one batch
    import time as _time
    _time.sleep(0.5)
    assert threading.active_count() <= before + 1  # producer wound down


def test_triplet_mining_deterministic_and_epoch_varied(fixture_dataset):
    out, _ = fixture_dataset
    ds = TaggedImageDataset(
        json_path=f"{out}/data.json", tags_csv_path=f"{out}/tags.csv",
        resolution=64, seed=3)
    a1 = ds._mine_triplet(0)
    a2 = ds._mine_triplet(0)
    assert a1 == a2  # deterministic within an epoch, regardless of threads
    ds.set_epoch(0)
    assert ds._mine_triplet(0) == a1  # epoch fully determines the stream
    triplets0 = [ds._mine_triplet(i) for i in range(8)]
    ds.set_epoch(1)
    triplets1 = [ds._mine_triplet(i) for i in range(8)]
    assert triplets0 != triplets1  # epochs vary the sampling


def test_corrupt_image_yields_dummy(tmp_path):
    """Unreadable images become black dummies (modules.py:717-729)."""
    import json as _json

    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not an image")
    (tmp_path / "tags.csv").write_text("name\nfoo\n")
    (tmp_path / "data.json").write_text(
        _json.dumps({str(bad): "foo:1.0"}))
    ds = TaggedImageDataset(json_path=str(tmp_path / "data.json"),
                            tags_csv_path=str(tmp_path / "tags.csv"),
                            resolution=32, return_triplets=False, seed=0)
    item = ds[0]
    assert item["pixel_values"].shape[2] == 3
    assert item["pixel_values"].sum() == 0  # black dummy


def test_sampler_pad_multiple(fixture_dataset):
    """pad_multiple rounds every batch up to the sublane multiple, padding
    from the batch's own chunk (gradient-neutral for exact multiples)."""
    out, _ = fixture_dataset
    ds = TaggedImageDataset(
        json_path=f"{out}/data.json", tags_csv_path=f"{out}/tags.csv",
        resolution=64, return_triplets=False, seed=0)
    sampler = BucketBatchSampler(ds, batch_size=4, shuffle=False,
                                 pad_multiple=8)
    assert sampler.device_batch_size == 8
    for indices, mask in sampler:
        assert len(indices) == 8 and len(mask) == 8
        assert mask[:4] == [True] * 4 and mask[4:] == [False] * 4
        # pads duplicate the chunk's own rows in order
        assert indices[4:] == indices[:4]


def test_sampler_epoch_deterministic_shuffle(fixture_dataset):
    """Shuffle order is a pure function of (seed, epoch) — not of how many
    epochs were iterated before — so a freshly constructed loader can replay
    any epoch's exact batch stream (mid-epoch resume)."""
    out, _ = fixture_dataset
    ds = TaggedImageDataset(
        json_path=f"{out}/data.json", tags_csv_path=f"{out}/tags.csv",
        resolution=64, return_triplets=False, seed=0)
    a = BucketBatchSampler(ds, batch_size=4, shuffle=True, seed=7)
    b = BucketBatchSampler(ds, batch_size=4, shuffle=True, seed=7)
    # advance `a` through two epochs first: epoch 2 must still match a
    # fresh sampler's epoch 2
    for e in range(3):
        a.set_epoch(e)
        order_a = list(a)
    b.set_epoch(2)
    assert order_a == list(b)
    # same epoch re-iterated is identical; different epochs differ
    assert list(b) == list(b)
    b.set_epoch(3)
    assert list(b) != order_a
    # different seeds differ at the same epoch
    c = BucketBatchSampler(ds, batch_size=4, shuffle=True, seed=8)
    c.set_epoch(2)
    assert list(c) != order_a


def test_loader_skip_next(fixture_dataset):
    """skip_next(n) drops exactly the first n batches of the next iteration
    only (mid-epoch resume jumps past already-trained batches)."""
    out, _ = fixture_dataset
    ds = TaggedImageDataset(
        json_path=f"{out}/data.json", tags_csv_path=f"{out}/tags.csv",
        resolution=64, return_triplets=False, seed=0)
    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=3)
    loader.set_epoch(5)
    full = [b["labels"] for b in loader]
    loader.set_epoch(5)
    loader.skip_next(2)
    tail = [b["labels"] for b in loader]
    assert len(tail) == len(full) - 2
    for got, want in zip(tail, full[2:]):
        np.testing.assert_array_equal(got, want)
    # one-shot: the following iteration is full-length again
    loader.set_epoch(5)
    assert len(list(loader)) == len(full)


def test_bucket_manifest_warm_restart_zero_opens(tmp_path, monkeypatch):
    """Cold start writes a size manifest beside data.json; a warm restart
    does ZERO image header opens for unchanged files, and only changed
    files are re-read (the reference re-opens every image every run,
    modules.py:553-556)."""
    import vae_tagger_tpu.data.bucketing as bucketing_mod

    out = str(tmp_path / "ds")
    create_synthetic_dataset(out, num_images=12, img_size=64, seed=0)
    opens = []
    orig = bucketing_mod.read_image_size
    monkeypatch.setattr(bucketing_mod, "read_image_size",
                        lambda p: (opens.append(str(p)) or orig(p)))

    kw = dict(json_path=f"{out}/data.json", tags_csv_path=f"{out}/tags.csv",
              use_bucketing=True, base_resolution=32, max_resolution=64,
              bucket_step=32, return_triplets=False, seed=0)
    ds1 = TaggedImageDataset(**kw)
    assert len(opens) == 12  # cold: every header read once
    manifest_file = f"{out}/data.json.bucket_manifest.json"
    import os
    assert os.path.exists(manifest_file)

    opens.clear()
    ds2 = TaggedImageDataset(**kw)
    assert opens == []  # warm: zero image opens
    assert ds2.bucketing.image_buckets == ds1.bucketing.image_buckets

    # a modified file (different mtime/size) is re-read; others are not
    victim = ds1.image_paths[3]
    from PIL import Image as _Image
    _Image.new("RGB", (100, 40)).save(victim)
    opens.clear()
    ds3 = TaggedImageDataset(**kw)
    assert opens == [str(victim)]
    assert ds3.bucketing.image_buckets[str(victim)] == \
        ds3.bucketing.assign_bucket_for_size(100, 40)

    # kill switch
    opens.clear()
    monkeypatch.setenv("VAE_TAGGER_NO_BUCKET_MANIFEST", "1")
    TaggedImageDataset(**kw)
    assert len(opens) == 12


def test_bucket_manifest_valid_across_grids(tmp_path):
    """The manifest caches pixel sizes, not bucket ids: a manifest written
    under one (base, max, step) grid assigns correctly under another."""
    import os

    import vae_tagger_tpu.data.bucketing as bucketing_mod

    out = str(tmp_path / "ds")
    create_synthetic_dataset(out, num_images=6, img_size=64, seed=0)
    kw = dict(json_path=f"{out}/data.json", tags_csv_path=f"{out}/tags.csv",
              use_bucketing=True, return_triplets=False, seed=0)
    TaggedImageDataset(base_resolution=32, max_resolution=64,
                       bucket_step=32, **kw)
    # second grid, warm manifest: no opens, buckets follow the NEW grid
    orig = bucketing_mod.read_image_size
    try:
        bucketing_mod.read_image_size = lambda p: (_ for _ in ()).throw(
            AssertionError("warm restart must not open images"))
        ds = TaggedImageDataset(base_resolution=64, max_resolution=64,
                                bucket_step=64, **kw)
    finally:
        bucketing_mod.read_image_size = orig
    assert set(ds.bucketing.image_buckets.values()) <= {(64, 64)}
