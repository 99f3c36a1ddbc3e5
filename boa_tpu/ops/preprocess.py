"""Preprocessing ops: crop-to-nonzero, CT normalization, centered padding.

Parity targets:
* `nnunetv2/preprocessing/cropping/cropping.py:19-39` crop_to_nonzero
* `nnunetv2/preprocessing/normalization/default_normalization_schemes.py:53-67`
  CTNormalization (clip to fingerprint 0.5/99.5 percentiles, z-score)
* acvl_utils pad_nd_image as used at `predict_from_raw_data.py:657`
  (centered constant-0 padding up to patch size, with revert slicer)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def nonzero_bbox(vol: np.ndarray | jax.Array) -> tuple[tuple[int, int], ...]:
    """Bounding box (start, stop) per axis of the nonzero region of the last
    3 axes. Matches nnU-Net's create_nonzero_mask bbox (fill_holes does not
    change the bounding box). Returns the full extent if all-zero."""
    v = jnp.asarray(vol)
    if v.ndim == 4:
        nz = jnp.any(v != 0, axis=0)
    else:
        nz = v != 0
    out = []
    for ax in range(3):
        other = tuple(i for i in range(3) if i != ax)
        line = jnp.any(nz, axis=other)
        n = line.shape[0]
        idx = jnp.arange(n)
        any_nz = jnp.any(line)
        first = jnp.where(any_nz, jnp.min(jnp.where(line, idx, n)), 0)
        last = jnp.where(any_nz, jnp.max(jnp.where(line, idx, -1)) + 1, n)
        out.append((int(first), int(last)))
    return tuple(out)


@jax.jit
def bbox_array(vol: jax.Array) -> jax.Array:
    """(3, 2) int32 nonzero bbox of the last 3 axes in ONE device program —
    a single host sync instead of six scalar pulls (each dispatch costs
    ~30 ms of round-trip latency on a tunneled TPU)."""
    nz = jnp.any(vol != 0, axis=0) if vol.ndim == 4 else vol != 0
    rows = []
    for ax in range(3):
        other = tuple(i for i in range(3) if i != ax)
        line = jnp.any(nz, axis=other)
        n = line.shape[0]
        idx = jnp.arange(n)
        any_nz = jnp.any(line)
        first = jnp.where(any_nz, jnp.min(jnp.where(line, idx, n)), 0)
        last = jnp.where(any_nz, jnp.max(jnp.where(line, idx, -1)) + 1, n)
        rows.append(jnp.stack([first, last]))
    return jnp.stack(rows).astype(jnp.int32)


def crop_to_bbox(vol: np.ndarray, bbox) -> np.ndarray:
    sl = tuple(slice(b[0], b[1]) for b in bbox)
    if vol.ndim == 4:
        return vol[(slice(None), *sl)]
    return vol[sl]


def ct_normalize(vol: jax.Array, props: dict) -> jax.Array:
    """CTNormalization: clip then z-score with dataset fingerprint stats."""
    lo = jnp.float32(props["percentile_00_5"])
    hi = jnp.float32(props["percentile_99_5"])
    mean = jnp.float32(props["mean"])
    std = jnp.float32(max(float(props["std"]), 1e-8))
    v = jnp.clip(vol.astype(jnp.float32), lo, hi)
    return (v - mean) / std


def zscore_normalize(vol: jax.Array) -> jax.Array:
    """ZScoreNormalization without mask (MR-style models)."""
    v = vol.astype(jnp.float32)
    mean = jnp.mean(v)
    std = jnp.maximum(jnp.std(v), 1e-8)
    return (v - mean) / std


def pad_to_patch(vol: np.ndarray, patch_size: tuple[int, ...]):
    """Center-pad the last 3 axes of `vol` up to at least patch_size with 0.

    Returns (padded, revert_slices) where revert_slices crops the padding
    back off (acvl pad_nd_image(return_slicer=True) semantics).
    """
    spatial = vol.shape[-3:]
    pads = []
    for n, p in zip(spatial, patch_size):
        d = max(p - n, 0)
        pads.append((d // 2, d - d // 2))
    full_pads = [(0, 0)] * (vol.ndim - 3) + pads
    padded = np.pad(vol, full_pads, mode="constant", constant_values=0)
    revert = tuple(slice(b, b + n) for (b, _), n in zip(pads, spatial))
    return padded, revert


def compute_steps(image_size: tuple[int, ...], tile_size: tuple[int, ...],
                  step_fraction: float) -> list[list[int]]:
    """Evenly-spaced sliding-window step grid.

    Parity: `nnunetv2/inference/sliding_window_prediction.py:30-54`.
    """
    assert all(i >= j for i, j in zip(image_size, tile_size))
    target = [t * step_fraction for t in tile_size]
    num_steps = [int(np.ceil((i - k) / j)) + 1
                 for i, j, k in zip(image_size, target, tile_size)]
    steps = []
    for dim in range(len(tile_size)):
        max_step = image_size[dim] - tile_size[dim]
        if num_steps[dim] > 1:
            actual = max_step / (num_steps[dim] - 1)
        else:
            actual = 1e11
        steps.append([int(np.round(actual * i)) for i in range(num_steps[dim])])
    return steps


def tile_starts(image_size: tuple[int, ...], tile_size: tuple[int, ...],
                step_fraction: float) -> np.ndarray:
    """(T, 3) int32 array of tile start coordinates, x-major like the
    reference's slicer loop order (`predict_from_raw_data.py:528-536`)."""
    steps = compute_steps(image_size, tile_size, step_fraction)
    out = [(sx, sy, sz) for sx in steps[0] for sy in steps[1] for sz in steps[2]]
    return np.asarray(out, dtype=np.int32)


def gaussian_importance_map(patch_size: tuple[int, ...], sigma_scale: float = 1.0 / 8,
                            value_scaling: float = 10.0) -> np.ndarray:
    """Gaussian tile-fusion weights.

    Parity: `sliding_window_prediction.py:10-27` — impulse at the center
    voxel, scipy gaussian_filter sigma=patch/8 (mode constant), scaled so the
    max is `value_scaling`, zeros clamped to the min nonzero value. Kept in
    fp32 (the reference's fp16 is an accumulator-overflow hazard it guards
    with a runtime inf check; see SURVEY.md §7(d))."""
    from scipy.ndimage import gaussian_filter

    tmp = np.zeros(patch_size)
    center = tuple(i // 2 for i in patch_size)
    sigmas = [i * sigma_scale for i in patch_size]
    tmp[center] = 1
    g = gaussian_filter(tmp, sigmas, 0, mode="constant", cval=0)
    g = g / g.max() * value_scaling
    # round through fp16 and clamp zeros to the min nonzero fp16 value,
    # exactly like the reference (`compute_gaussian` .half() + zero-fix):
    # keeps the fp16 tile accumulators free of 0/0 at patch corners.
    g = g.astype(np.float16)
    mask = g == 0
    if mask.any():
        g[mask] = g[~mask].min()
    return g.astype(np.float32)
