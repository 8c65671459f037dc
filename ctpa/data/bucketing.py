"""Shape-bucketed batching for heterogeneous raw CT scans.

XLA compiles one executable per input SHAPE.  Real CT archives vary per scan
(the reference ships metadata CSVs precisely because z-extent and in-plane
matrix differ, data_prep.py:6-40), so feeding raw scans directly would either
recompile per shape or force offline pre-extraction.  Here raw shapes are
rounded UP to a small lattice of buckets; each volume is end-padded to its
bucket and its TRUE extent travels alongside.  `ops/preprocess.resample_crop_pad`
consumes the true extent in its interpolation-matrix arithmetic, so bucketing
is numerically EXACT — padded voxels are never read (their matrix columns are
never selected), not merely masked after the fact.

Typical train wiring (tested in tests/test_bucketing.py):

    bucketer = ShapeBucketer(batch_size=2)
    for batch in bucketer.batches(samples):       # same-bucket batches
        out = preprocess_batch_bucketed(batch["volumes"], ..., batch["src_shapes"])

Compile count is bounded by the number of DISTINCT BUCKETS (typically 2-4 for
a real archive), not the number of distinct raw shapes.
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator, Sequence

import numpy as np


def bucket_shape(
    shape: Sequence[int],
    mults: Sequence[int] = (32, 64, 64),
) -> tuple[int, ...]:
    """Round each axis UP to its lattice multiple: the bucket this shape pads
    into.  Default lattice (32, 64, 64) keeps padding waste <= ~15% for
    typical CT geometries while collapsing hundreds of raw shapes to a few
    buckets."""
    return tuple(int(-(-s // m) * m) for s, m in zip(shape, mults))


def pad_to_bucket(vol: np.ndarray, bucket: Sequence[int]) -> np.ndarray:
    """End-pad (never crop) a raw volume to its bucket shape.  Fill value is
    irrelevant by construction — the resample never selects padded columns —
    zeros keep npz compression honest."""
    pads = [(0, b - s) for s, b in zip(vol.shape, bucket)]
    if any(p[1] < 0 for p in pads):
        raise ValueError(f"bucket {tuple(bucket)} smaller than volume {vol.shape}")
    if all(p == (0, 0) for p in pads):
        return vol
    return np.pad(vol, pads)


class ShapeBucketer:
    """Groups raw-scan samples into same-bucket batches.

    Samples are dicts with at least {"volume": (d,h,w) ndarray}; any other
    keys (slope, intercept, spacing, text, ...) pass through and are stacked
    where they are arrays/scalars, listed otherwise.  Incomplete groups flush
    at the end (smaller final batch per bucket), mirroring a drop_last=False
    DataLoader."""

    def __init__(self, batch_size: int, mults: Sequence[int] = (32, 64, 64)):
        self.batch_size = batch_size
        self.mults = tuple(mults)

    def batches(self, samples: Iterable[dict]) -> Iterator[dict]:
        groups: dict[tuple, list[dict]] = collections.defaultdict(list)
        for s in samples:
            b = bucket_shape(s["volume"].shape, self.mults)
            groups[b].append(s)
            if len(groups[b]) == self.batch_size:
                yield self._collate(b, groups.pop(b))
        for b in sorted(groups):
            yield self._collate(b, groups[b])

    def _collate(self, bucket: tuple, group: list[dict]) -> dict:
        out: dict = {
            "bucket": bucket,
            "volumes": np.stack([pad_to_bucket(s["volume"], bucket) for s in group]),
            "src_shapes": np.asarray([s["volume"].shape for s in group], np.int32),
        }
        for key in group[0]:
            if key == "volume":
                continue
            vals = [s[key] for s in group]
            if isinstance(vals[0], (int, float, np.floating, np.integer)) or (
                isinstance(vals[0], np.ndarray)
            ):
                out[key] = np.asarray(vals)
            else:
                out[key] = vals
        return out
