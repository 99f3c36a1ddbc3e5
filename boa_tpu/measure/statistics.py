"""Per-class segmentation statistics as on-device segmented reductions.

Parity: `totalsegmentator/statistics.py:91-141` `get_basic_statistics` —
per-class volume (mm^3) + mean/median HU, with border-touching exclusion
(3-voxel margin on every face, `:76-89`).

TPU design: the reference loops classes in numpy (hot loop #3 of SURVEY §3).
Here one jitted pass computes per-class voxel counts, HU sums and a
per-class HU histogram via scatter-adds; because the reference casts CT to
int16 before reducing (`statistics.py:104`), histogram-based medians and
percentiles are *exact*, not approximations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

HU_MIN = -1024
HU_MAX = 3071
N_BINS = HU_MAX - HU_MIN + 1  # one bin per integer HU


@partial(jax.jit, static_argnames=("num_classes", "with_histogram"))
def segmented_stats(seg: jax.Array, ct: jax.Array, num_classes: int,
                    with_histogram: bool = True):
    """Returns dict of per-class arrays:
    count, hu_sum, hu_sumsq, border (1 if class touches any 3-voxel margin),
    hist (num_classes, N_BINS) when with_histogram.

    One scatter pass builds the exact per-class integer-HU histogram; every
    moment then derives from the (num_classes, 4096) histogram instead of
    separate full-volume scatter reductions — TPU scatter cost scales with
    UPDATE count (78M for a 512×512×300 study), so the three extra
    per-class segment-sums cost ~0.7 s each while the 4096-term
    histogram contractions are microseconds. The border indicator only
    needs the 3-voxel face shell (~3% of voxels), so its scatter runs on
    the concatenated face slabs.
    """
    segf = seg.astype(jnp.int32).ravel()
    cti = jnp.clip(ct.astype(jnp.int32), HU_MIN, HU_MAX).ravel()

    if with_histogram:
        combined = segf * N_BINS + (cti - HU_MIN)
        # accumulate in int32: fp32 loses exactness above 2^24 counts/
        # bucket (a uniform giant class — e.g. all-background — exceeds it)
        hist_i = jax.ops.segment_sum(jnp.ones_like(combined, jnp.int32),
                                     combined,
                                     num_segments=num_classes * N_BINS
                                     ).reshape(num_classes, N_BINS)
        hist = hist_i.astype(jnp.float32)

        values = jnp.arange(HU_MIN, HU_MAX + 1, dtype=jnp.float32)
        count = jnp.sum(hist_i, axis=1).astype(jnp.float32)
        hu_sum = hist @ values
        hu_sumsq = hist @ (values * values)
    else:
        # moments only: one-hot over classes reduced over voxels — a
        # fused bandwidth-bound pass instead of the 78M-update histogram
        # scatter (TPU scatter-adds serialize; see _slicewise_pass). The
        # reduce fusion keeps the (V, C) one-hot virtual; a dot would
        # materialize it (37 GB at 118 classes).
        oh = (segf[:, None] == jnp.arange(num_classes, dtype=jnp.int32))
        ctf = cti.astype(jnp.float32)
        count = jnp.sum(oh.astype(jnp.int32), axis=0).astype(jnp.float32)
        ohf = oh.astype(jnp.float32)
        hu_sum = jnp.sum(ohf * ctf[:, None], axis=0)
        hu_sumsq = jnp.sum(ohf * (ctf * ctf)[:, None], axis=0)

    # border: classes present on any 3-voxel face margin — reduce only the
    # six face slabs
    seg3 = seg.astype(jnp.int32)
    x, y, z = seg3.shape
    shell = jnp.concatenate([
        seg3[:3].ravel(), seg3[x - 3:].ravel(),
        seg3[:, :3].ravel(), seg3[:, y - 3:].ravel(),
        seg3[:, :, :3].ravel(), seg3[:, :, z - 3:].ravel()])
    border = jax.ops.segment_max(
        jnp.ones_like(shell, jnp.float32), shell, num_segments=num_classes)
    border = jnp.maximum(border, 0.0)  # segment_max of empty segment = -inf

    out = {"count": count, "hu_sum": hu_sum, "hu_sumsq": hu_sumsq,
           "border": border}
    if with_histogram:
        out["hist"] = hist
    return out


def quantile_from_hist(hist: np.ndarray, q: float) -> np.ndarray:
    """Per-class q-quantile (numpy 'linear' method) from integer-HU
    histograms. hist: (C, N_BINS). Exact for integer-valued samples."""
    counts = hist.sum(axis=1)
    cum = np.cumsum(hist, axis=1)
    values = np.arange(HU_MIN, HU_MAX + 1, dtype=np.float64)
    out = np.zeros(hist.shape[0])
    for c in range(hist.shape[0]):
        n = counts[c]
        if n == 0:
            continue
        pos = q * (n - 1)
        lo_idx = int(np.floor(pos))
        hi_idx = min(lo_idx + 1, int(n) - 1)
        frac = pos - lo_idx
        lo_v = values[np.searchsorted(cum[c], lo_idx + 1)]
        hi_v = values[np.searchsorted(cum[c], hi_idx + 1)]
        out[c] = lo_v + (hi_v - lo_v) * frac
    return out


def get_basic_statistics(seg: np.ndarray, ct: np.ndarray, spacing,
                         class_map: dict[int, str],
                         exclude_masks_at_border: bool = True,
                         metric: str = "mean",
                         roi_subset: list[str] | None = None,
                         normalized_intensities: bool = False) -> dict:
    """TotalSegmentator statistics dict: {name: {volume, intensity}}.

    `normalized_intensities` reports intensities of the min-max-normalized
    CT (`statistics.py:108-109` rescales the int16 volume to [0, 1]). The
    rescale is affine and monotone, so mean and median commute with it —
    computed here from the HU stats plus the global min/max, exactly.
    """
    num_classes = max(class_map.keys()) + 1
    if isinstance(ct, jax.Array):  # device-resident: cast on device
        ct16 = ct.astype(jnp.int16)
    else:
        ct16 = jnp.asarray(np.asarray(ct, dtype=np.int16))  # reference int16 cast
    cmin, cscale = 0.0, 1.0
    if normalized_intensities:
        cmin = float(jnp.min(ct16))
        cscale = max(float(jnp.max(ct16)) - cmin, 1e-8)
    res = segmented_stats(jnp.asarray(seg), ct16, num_classes,
                          with_histogram=(metric == "median"))
    count = np.asarray(res["count"])
    hu_sum = np.asarray(res["hu_sum"])
    border = np.asarray(res["border"])
    if metric == "median":
        med = quantile_from_hist(np.asarray(res["hist"]), 0.5)
    vox_vol = float(np.prod(np.asarray(spacing, dtype=np.float64)))

    stats: dict[str, dict] = {}
    for k, name in class_map.items():
        if roi_subset is not None and name not in roi_subset:
            continue
        entry: dict[str, float] = {}
        if exclude_masks_at_border and border[k] > 0:
            entry["volume"] = 0.0
            entry["intensity"] = 0.0
        else:
            entry["volume"] = float(count[k] * vox_vol)
            if count[k] == 0:
                entry["intensity"] = 0.0
            elif metric == "mean":
                entry["intensity"] = float(np.round(
                    (hu_sum[k] / count[k] - cmin) / cscale, 5))
            else:
                entry["intensity"] = float(np.round(
                    (med[k] - cmin) / cscale, 5))
        stats[name] = entry
    return stats
