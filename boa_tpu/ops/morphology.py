"""Binary morphology on device (XLA reduce_window) with scipy-equivalent
semantics.

The reference uses scipy binary_dilation/binary_erosion with the default
cross structuring element and `iterations=N`
(`totalsegmentator/postprocessing.py:124,147-148`) and skimage
binary_erosion with a cubic kernel (`body_organ_analysis/compute/
measurements.py:61-71`). Dilation with a cross N times == max-pool over the
6-neighborhood iterated N times; erosion likewise with min-pool. Box-kernel
erosion is a single min-pool with a k^3 window.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("iterations", "dilate"))
def _iterate_cross(mask: jax.Array, iterations: int, dilate: bool) -> jax.Array:
    def step(m):
        shifted = [m]
        for ax in range(3):
            shifted.append(jnp.roll(m, 1, axis=ax).at[_first(ax, m.ndim)].set(
                0 if dilate else 1))
            shifted.append(jnp.roll(m, -1, axis=ax).at[_last(ax, m.ndim)].set(
                0 if dilate else 1))
        stack = jnp.stack(shifted)
        return jnp.max(stack, 0) if dilate else jnp.min(stack, 0)

    out = mask
    for _ in range(iterations):
        out = step(out)
    return out


def _first(ax: int, ndim: int):
    idx = [slice(None)] * ndim
    idx[ax] = 0
    return tuple(idx)


def _last(ax: int, ndim: int):
    idx = [slice(None)] * ndim
    idx[ax] = -1
    return tuple(idx)


def binary_dilation_cross(mask, iterations: int = 1) -> np.ndarray:
    """scipy.ndimage.binary_dilation(structure=None, iterations=N) parity.

    Border handling: scipy treats outside as 0 for dilation.
    """
    m = jnp.asarray(np.asarray(mask) > 0, jnp.uint8)
    return np.asarray(_iterate_cross(m, iterations, True)).astype(np.uint8)


def binary_erosion_cross(mask, iterations: int = 1) -> np.ndarray:
    """scipy.ndimage.binary_erosion(structure=None, iterations=N) parity
    with default border_value=0 (everything at the border erodes)."""
    m = jnp.asarray(np.asarray(mask) > 0, jnp.uint8)
    out = _iterate_cross_border0(m, iterations)
    return np.asarray(out).astype(np.uint8)


@partial(jax.jit, static_argnames=("iterations",))
def _iterate_cross_border0(mask: jax.Array, iterations: int) -> jax.Array:
    def step(m):
        shifted = [m]
        for ax in range(3):
            shifted.append(jnp.roll(m, 1, axis=ax).at[_first(ax, m.ndim)].set(0))
            shifted.append(jnp.roll(m, -1, axis=ax).at[_last(ax, m.ndim)].set(0))
        return jnp.min(jnp.stack(shifted), 0)

    out = mask
    for _ in range(iterations):
        out = step(out)
    return out


@partial(jax.jit, static_argnames=("size",))
def erosion_box(mask: jax.Array, size: int) -> jax.Array:
    """scipy/skimage binary_erosion with a size^3 ones footprint: min over
    the window, border treated as 0 (scipy border_value=0). scipy centers
    the footprint at size // 2, so the window spans [-(size//2),
    size-1-size//2]. Implemented as explicit 0-pad + VALID min-pool."""
    m = jnp.asarray(mask, jnp.float32)
    lo = size // 2
    hi = size - 1 - lo
    mp = jnp.pad(m, [(lo, hi)] * 3, constant_values=0.0)
    out = -jax.lax.reduce_window(
        -mp, -jnp.inf, jax.lax.max, (size, size, size), (1, 1, 1),
        [(0, 0)] * 3)
    return (out > 0.5).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("size",))
def erosion_box_border1(mask: jax.Array, size: int) -> jax.Array:
    """skimage.morphology.binary_erosion parity: box footprint, border
    treated as True (skimage pads with 1 so edges do not erode inward).
    Even sizes follow skimage pad_footprint(pad_end=True): window spans
    [-(size//2), size-1-size//2]."""
    m = jnp.asarray(mask, jnp.float32)
    lo = size // 2
    hi = size - 1 - lo
    mp = jnp.pad(m, [(lo, hi)] * 3, constant_values=1.0)
    out = -jax.lax.reduce_window(
        -mp, -jnp.inf, jax.lax.max, (size, size, size), (1, 1, 1),
        [(0, 0)] * 3)
    return (out > 0.5).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("size",))
def dilation_box(mask: jax.Array, size: int) -> jax.Array:
    """Box dilation, border treated as 0; scipy centering (size // 2)."""
    m = jnp.asarray(mask, jnp.float32)
    # dilation window is the mirrored footprint: spans [-(size-1-size//2), size//2]
    hi = size // 2
    lo = size - 1 - hi
    mp = jnp.pad(m, [(lo, hi)] * 3, constant_values=0.0)
    out = jax.lax.reduce_window(
        mp, -jnp.inf, jax.lax.max, (size, size, size), (1, 1, 1), [(0, 0)] * 3)
    return (out > 0.5).astype(jnp.uint8)


def binary_fill_holes_host(mask: np.ndarray) -> np.ndarray:
    """Host fallback for fill_holes (used in crop_to_nonzero parity paths)."""
    from scipy import ndimage

    return ndimage.binary_fill_holes(mask)


@partial(jax.jit, static_argnames=("size",))
def median_filter_inplane(vol: jax.Array, size: int = 3) -> jax.Array:
    """In-plane (x,y) median filter, z untouched.

    Parity: `body_composition_analysis/tissue/subclassification.py:10-63`
    optional scipy.ndimage.median_filter((3, 3, 1)). Implemented as a sort
    network over the 9 shifted copies (VPU-friendly, no gather).
    """
    assert size == 3, "only 3x3 supported"
    pads = [(1, 1), (1, 1), (0, 0)]
    # scipy 'reflect' repeats the edge sample == numpy/jnp 'symmetric'
    v = jnp.pad(vol, pads, mode="symmetric")
    neigh = []
    for dx in range(3):
        for dy in range(3):
            neigh.append(v[dx:dx + vol.shape[0], dy:dy + vol.shape[1], :])
    stack = jnp.stack(neigh, axis=0)
    return jnp.median(stack, axis=0).astype(vol.dtype)
