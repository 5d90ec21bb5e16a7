"""Tagged image dataset: JSON metadata + tags CSV, weighted multi-labels,
online triplet mining.

Dataset format (byte-compatible with the reference, modules.py:487-548):
  data.json:  {"path/to/img.png": "tag_a:1.0, tag_b:0.8, tag_c", ...}
  tags.csv:   must contain a ``name`` column; row order defines class index.

TPU-first differences from the reference:
- labels live in one dense (N, num_tags) float32 matrix (vectorized overlap
  computations for triplet mining instead of per-pair tensor ops);
- __getitem__ returns HWC uint8 numpy (normalization happens on device);
- bucket assignment reads image headers once up front; the loader batches
  per bucket so each compiled shape is reused.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from .bucketing import (
    AspectRatioBucketing,
    ImageSizeManifest,
    dummy_image,
    load_and_transform_image,
)


def load_tag_names(tags_csv_path: str) -> List[str]:
    """Read the ``name`` column (the only column the pipeline uses; any
    ``count`` column is informational — see example_tags.csv note in
    SURVEY.md §2.1)."""
    import pandas as pd

    df = pd.read_csv(tags_csv_path)
    if "name" not in df.columns:
        raise ValueError(f"{tags_csv_path} must contain a 'name' column")
    return [str(t) for t in df["name"]]


def parse_weighted_tags(prompt: str, tag_to_idx: Dict[str, int],
                        num_tags: int) -> np.ndarray:
    """'tag_a:1.0, tag_b:0.8, tag_c' -> float32 label vector.

    Missing weight defaults to 1.0; malformed weights default to 1.0; unknown
    tags are ignored (modules.py:512-548 semantics)."""
    labels = np.zeros(num_tags, dtype=np.float32)
    for entry in str(prompt).split(","):
        entry = entry.strip()
        if not entry:
            continue
        if ":" in entry:
            tag, weight_s = entry.split(":", 1)
            tag = tag.strip()
            try:
                weight = float(weight_s.strip())
            except ValueError:
                weight = 1.0
        else:
            tag, weight = entry, 1.0
        if tag in tag_to_idx:
            labels[tag_to_idx[tag]] = weight
    return labels


class TaggedImageDataset:
    """Map-style dataset; ``__getitem__`` returns a dict of numpy arrays:
    pixel_values/anchor/positive/negative (HWC uint8) and
    labels/positive_labels/negative_labels (float32 vectors)."""

    def __init__(self, json_path: str, tags_csv_path: str,
                 resolution: Optional[int] = 512,
                 use_bucketing: bool = False, base_resolution: int = 512,
                 max_resolution: int = 1024, bucket_step: int = 64,
                 return_triplets: bool = True,
                 max_candidates: int = 100,
                 seed: Optional[int] = None,
                 crop_mode: str = "center",
                 transfer_format: str = "rgb"):
        with open(json_path, "r", encoding="utf-8") as f:
            self.data = json.load(f)
        self.tags = load_tag_names(tags_csv_path)
        self.tag_to_idx = {t: i for i, t in enumerate(self.tags)}
        self.idx_to_tag = {i: t for t, i in self.tag_to_idx.items()}
        self.image_paths: List[str] = list(self.data.keys())
        self.resolution = resolution
        # deterministic 'center' is the default; anything stochastic (e.g.
        # 'random' crops) makes samples non-reproducible, which downstream
        # caches key on — train_decoder disables --cache_latents unless this
        # is 'center'
        self.crop_mode = crop_mode
        # 'yuv420': each image travels as <key>_y (H, W) + <key>_cbcr
        # (2, H/2, W/2) planar uint8 — 1.5 B/px instead of RGB's 3.  The
        # transform itself is unchanged (SmartResize/bucket RGB, converted
        # after); the train steps reconstitute uint8 RGB on device
        # (train/steps.py::resolve_transfer_format), so numerics match the
        # RGB path to within the 4:2:0 chroma subsample.
        if transfer_format not in ("rgb", "yuv420"):
            raise ValueError(f"unknown transfer_format {transfer_format!r}")
        if transfer_format == "yuv420":
            dims = ([base_resolution, bucket_step] if use_bucketing
                    else [resolution or 512])
            if any(d % 2 for d in dims):
                raise ValueError("yuv420 transfer needs even image dims; "
                                 f"got {dims}")
        self.transfer_format = transfer_format
        self.return_triplets = return_triplets
        self.max_candidates = max_candidates
        self._seed = seed if seed is not None else 0
        self.epoch = 0  # bump via set_epoch() to vary triplets per epoch

        # dense label matrix
        self.labels_matrix = np.stack([
            parse_weighted_tags(self.data[p], self.tag_to_idx, len(self.tags))
            for p in self.image_paths
        ]) if self.image_paths else np.zeros((0, len(self.tags)), np.float32)
        # binary presence for overlap tests
        self._presence = (self.labels_matrix > 0)

        self.use_bucketing = use_bucketing
        if use_bucketing:
            print("aspect-ratio bucketing enabled...")
            self.bucketing = AspectRatioBucketing(
                base_resolution, max_resolution, bucket_step)
            # Persisted size manifest beside data.json: warm restarts do
            # ZERO image opens for unchanged files (one os.stat each) — the
            # reference re-reads every header every run (modules.py:553-556)
            manifest = ImageSizeManifest.for_dataset(json_path)
            for p in self.image_paths:
                self.bucketing.assign_bucket(p, manifest=manifest)
            manifest.save()
            self.bucketing.print_bucket_info()
        else:
            self.bucketing = None

    # -- reference-compatible accessors ------------------------------------
    @property
    def image_labels(self) -> Dict[str, np.ndarray]:
        return {p: self.labels_matrix[i]
                for i, p in enumerate(self.image_paths)}

    def class_distribution(self) -> np.ndarray:
        """Positive-image count per tag (improved_losses.py:341-348)."""
        from ..losses.combined import compute_class_distribution

        return compute_class_distribution(self.labels_matrix)

    def set_epoch(self, epoch: int) -> None:
        """Vary triplet sampling across epochs (torch DataLoader-style).
        Called by the training loop; keeps mining deterministic under the
        loader's thread pool (a shared random.Random mutated from worker
        threads is schedule-dependent)."""
        self.epoch = epoch

    def bucket_of(self, idx: int) -> Optional[Tuple[int, int]]:
        if not self.use_bucketing:
            return None
        return self.bucketing.image_buckets.get(self.image_paths[idx])

    def __len__(self) -> int:
        return len(self.image_paths)

    # -- triplet mining (modules.py:599-686 policy) -------------------------
    def _mine_triplet(self, anchor_idx: int) -> Tuple[int, int]:
        # per-(seed, epoch, anchor) rng: deterministic regardless of loader
        # thread scheduling, fresh triplets every epoch.  hash of an int
        # tuple is deterministic (PYTHONHASHSEED only salts str/bytes).
        rng = np.random.default_rng(
            hash((self._seed, self.epoch, anchor_idx)) & 0xFFFFFFFFFFFFFFFF)
        n = len(self.image_paths)
        anchor_tag_count = float(self.labels_matrix[anchor_idx].sum())

        k = min(self.max_candidates, max(0, n - 1))
        if k <= 0:
            return anchor_idx, anchor_idx
        # O(k) candidate draw without replacement over [0, n) \ {anchor}:
        # sample from n-1 slots and shift past the anchor (the reference's
        # per-sample rejection loop is O(k) python iterations per __getitem__
        # — measurable on a 1-core host at real dataset sizes)
        cand_arr = rng.choice(n - 1, size=k, replace=False).astype(np.int64)
        cand_arr += cand_arr >= anchor_idx
        overlaps = (self.labels_matrix[cand_arr]
                    * self.labels_matrix[anchor_idx]).sum(axis=1)
        positives = cand_arr[overlaps > 0]
        negatives = cand_arr[overlaps <= 0]  # reference else-branch: anything
        # without positive overlap (incl. negative weights) is a negative

        if anchor_tag_count > 1 and positives.size:
            pos_overlaps = overlaps[overlaps > 0]
            # prefer the max-overlap positive with p=0.7 when there's a choice
            if positives.size > 1 and rng.random() < 0.7:
                positive_idx = int(positives[int(np.argmax(pos_overlaps))])
            else:
                positive_idx = int(rng.choice(positives))
        elif positives.size:
            positive_idx = int(rng.choice(positives))
        else:
            positive_idx = anchor_idx  # rare tag combination: use anchor

        if negatives.size:
            negative_idx = int(rng.choice(negatives))
        elif n > 1:
            negative_idx = int(rng.integers(n - 1))
            negative_idx += negative_idx >= anchor_idx
        else:
            negative_idx = anchor_idx
        return positive_idx, negative_idx

    # -- loading -------------------------------------------------------------
    def _load(self, idx: int, bucket_idx: Optional[int] = None) -> np.ndarray:
        return self._load_checked(idx, bucket_idx)[0]

    def _load_checked(self, idx: int, bucket_idx: Optional[int] = None):
        """(image, ok).  When ``bucket_idx`` is given, resize into THAT
        sample's bucket (triplet members share the anchor's bucket so one
        batch is a single static shape — the reference loads each member in
        its own bucket, which breaks collation for batch > 1).  ok=False
        marks the dummy-image fallback so downstream caches (e.g.
        --cache_latents) never pin a transient load failure."""
        path = self.image_paths[idx]
        bucket = self.bucket_of(bucket_idx if bucket_idx is not None else idx)
        try:
            return load_and_transform_image(
                path, resolution=self.resolution, bucket=bucket,
                crop_mode=self.crop_mode), True
        except Exception as e:
            print(f"warning: could not load image {path}: {e}")
            if bucket is not None:
                return dummy_image(bucket[0], bucket[1]), False
            return dummy_image(self.resolution or 512,
                               self.resolution or 512), False

    def _emit(self, item: dict, key: str, image: np.ndarray) -> None:
        """Store ``image`` under ``key`` in the configured wire format."""
        if self.transfer_format == "yuv420":
            from .bucketing import to_yuv420

            item[key + "_y"], item[key + "_cbcr"] = to_yuv420(image)
        else:
            item[key] = image

    def __getitem__(self, idx: int) -> dict:
        anchor_img, load_ok = self._load_checked(idx)
        anchor_labels = self.labels_matrix[idx]
        item = {
            "labels": anchor_labels,
            "index": idx,
            "load_ok": np.bool_(load_ok),
        }
        if not self.return_triplets:
            # classification mode: the image travels as pixel_values
            # (in triplet mode it travels once, as "anchor" — the reference
            # ships the same image twice, modules.py:640-648)
            self._emit(item, "pixel_values", anchor_img)
        if self.return_triplets:
            pos_idx, neg_idx = self._mine_triplet(idx)
            self._emit(item, "anchor", anchor_img)
            self._emit(item, "positive",
                       anchor_img if pos_idx == idx
                       else self._load(pos_idx, bucket_idx=idx))
            self._emit(item, "negative",
                       anchor_img if neg_idx == idx
                       else self._load(neg_idx, bucket_idx=idx))
            item.update({
                "positive_labels": self.labels_matrix[pos_idx],
                "negative_labels": self.labels_matrix[neg_idx],
            })
        return item
