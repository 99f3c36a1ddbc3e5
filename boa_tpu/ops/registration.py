"""Affine image registration as jitted gradient descent on TPU.

Parity target: the reference's atlas registration for the Evans-index
tool (`totalsegmentator/bin/totalseg_evans_index.py` +
`totalsegmentator/registration.py:12+`, ANTs "AffineFast" to
`resources/ct_brain_atlas_1mm.nii.gz`). ANTs is a C++ dependency; here
the same similarity registration is a few hundred Adam steps on a
normalized-cross-correlation loss, with the warp as a differentiable
trilinear gather — everything jit-compiled, multi-resolution for capture
range.

Parametrization: translation (voxels), rotation (axis-angle, radians),
log-scale per axis (optionally locked), shear. The transform maps FIXED
voxel coordinates to MOVING voxel coordinates about the volume center
(the resample convention used by scipy.ndimage.affine_transform).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def affine_warp(vol: jax.Array, matrix: jax.Array,
                out_shape: tuple[int, int, int],
                order: int = 1, cval: float = 0.0) -> jax.Array:
    """Sample `vol` at A @ x for every output voxel x (homogeneous 3x4/4x4).

    order 1 = trilinear (differentiable wrt matrix AND vol), order 0 =
    nearest (for label maps).
    """
    matrix = jnp.asarray(matrix, jnp.float32)
    grids = jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32)
                           for s in out_shape], indexing="ij")
    ones = jnp.ones_like(grids[0])
    coords = jnp.stack([grids[0], grids[1], grids[2], ones], axis=-1)
    src = coords.reshape(-1, 4) @ matrix[:3].T  # (N, 3) moving coords

    shape = jnp.asarray(vol.shape, jnp.float32)
    if order == 0:
        idx = jnp.round(src)
        valid = jnp.all((idx >= 0) & (idx <= shape - 1), axis=1)
        idx = jnp.clip(idx, 0, shape - 1).astype(jnp.int32)
        out = vol[idx[:, 0], idx[:, 1], idx[:, 2]]
        out = jnp.where(valid, out, jnp.asarray(cval, vol.dtype))
        return out.reshape(out_shape)

    valid = jnp.all((src >= 0) & (src <= shape - 1), axis=1)
    lo = jnp.clip(jnp.floor(src), 0, shape - 2).astype(jnp.int32)
    frac = src - lo  # after clipping: frac hits 1 at the top edge
    volf = vol.astype(jnp.float32)
    acc = jnp.zeros(src.shape[0], jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (jnp.where(dx, frac[:, 0], 1 - frac[:, 0])
                     * jnp.where(dy, frac[:, 1], 1 - frac[:, 1])
                     * jnp.where(dz, frac[:, 2], 1 - frac[:, 2]))
                acc += w * volf[lo[:, 0] + dx, lo[:, 1] + dy, lo[:, 2] + dz]
    acc = jnp.where(valid, acc, cval)
    return acc.reshape(out_shape)


class AffineParams(NamedTuple):
    translation: jax.Array  # (3,) voxels
    rotation: jax.Array     # (3,) axis-angle radians
    log_scale: jax.Array    # (3,)
    shear: jax.Array        # (3,) xy, xz, yz


def identity_params() -> AffineParams:
    z = jnp.zeros(3, jnp.float32)
    return AffineParams(z, z, z, z)


def _rotation_matrix(r: jax.Array) -> jax.Array:
    """Rodrigues axis-angle -> 3x3 (differentiable at 0 via safe norm)."""
    theta2 = jnp.sum(r * r)
    theta = jnp.sqrt(theta2 + 1e-12)  # eps-smoothed: exact identity at 0,
    k = r / theta                     # nonzero gradient (no where-branch)
    kx = jnp.array([[0.0, -k[2], k[1]],
                    [k[2], 0.0, -k[0]],
                    [-k[1], k[0], 0.0]])
    return jnp.eye(3) + jnp.sin(theta) * kx + (1 - jnp.cos(theta)) * (kx @ kx)


def params_to_matrix(p: AffineParams, fixed_shape, moving_shape) -> jax.Array:
    """3x4 matrix mapping fixed voxel coords -> moving voxel coords,
    rotating/scaling about the respective volume centers."""
    rot = _rotation_matrix(p.rotation)
    scale = jnp.diag(jnp.exp(p.log_scale))
    shear = jnp.array([[1.0, p.shear[0], p.shear[1]],
                       [0.0, 1.0, p.shear[2]],
                       [0.0, 0.0, 1.0]])
    lin = rot @ scale @ shear
    c_fixed = (jnp.asarray(fixed_shape, jnp.float32) - 1) / 2
    c_moving = (jnp.asarray(moving_shape, jnp.float32) - 1) / 2
    offset = c_moving + p.translation - lin @ c_fixed
    return jnp.concatenate([lin, offset[:, None]], axis=1)


def ncc_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    """Negative normalized cross-correlation (global)."""
    af = a.ravel() - jnp.mean(a)
    bf = b.ravel() - jnp.mean(b)
    denom = jnp.sqrt(jnp.sum(af * af) * jnp.sum(bf * bf)) + 1e-6
    return -jnp.sum(af * bf) / denom


def _downsample(vol: jax.Array, factor: int) -> jax.Array:
    if factor == 1:
        return vol
    s = [(d // factor) * factor for d in vol.shape]
    v = vol[:s[0], :s[1], :s[2]]
    v = v.reshape(s[0] // factor, factor, s[1] // factor, factor,
                  s[2] // factor, factor)
    return v.mean(axis=(1, 3, 5))


@partial(jax.jit, static_argnames=("steps", "with_scale", "with_shear"))
def _register_level(fixed, moving, init: AffineParams, lr: float,
                    steps: int, with_scale: bool, with_shear: bool):
    import optax

    opt = optax.adam(lr)

    def loss_fn(p: AffineParams):
        m = params_to_matrix(p, fixed.shape, moving.shape)
        warped = affine_warp(moving, m, fixed.shape)
        return ncc_loss(fixed, warped)

    def step(carry, _):
        p, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        if not with_scale:
            grads = grads._replace(log_scale=jnp.zeros(3))
        if not with_shear:
            grads = grads._replace(shear=jnp.zeros(3))
        updates, opt_state = opt.update(grads, opt_state)
        p = jax.tree.map(lambda a, u: a + u, p, updates)
        return (p, opt_state), loss

    (p, _), losses = jax.lax.scan(step, (init, opt.init(init)), None,
                                  length=steps)
    return p, losses


def register_affine(fixed: np.ndarray, moving: np.ndarray,
                    levels=(4, 2, 1), steps_per_level=150, lr=0.05,
                    with_scale: bool = True, with_shear: bool = False
                    ) -> tuple[AffineParams, np.ndarray, float]:
    """Multi-resolution affine registration.

    Returns (params, 3x4 matrix mapping fixed->moving voxel coords at
    FULL resolution, final NCC). Intensity volumes should be pre-clipped
    to the tissue window of interest.
    """
    fixed = jnp.asarray(np.asarray(fixed, np.float32))
    moving = jnp.asarray(np.asarray(moving, np.float32))
    p = identity_params()
    final_loss = 0.0
    for level in levels:
        f = _downsample(fixed, level)
        m = _downsample(moving, level)
        # translation lives in voxels of the current pyramid level
        p_level = p._replace(translation=p.translation / level)
        lr_level = lr if level > 1 else lr * 0.4
        p_level, losses = _register_level(f, m, p_level, lr_level,
                                          steps_per_level, with_scale,
                                          with_shear)
        p = p_level._replace(translation=p_level.translation * level)
        final_loss = float(losses[-1])
    matrix = np.asarray(params_to_matrix(p, fixed.shape, moving.shape))
    return p, matrix, -final_loss


def warp_labels(labels: np.ndarray, matrix: np.ndarray,
                out_shape: tuple[int, int, int]) -> np.ndarray:
    """Nearest-neighbour warp of a label volume with a fixed->moving
    matrix (labels live on the moving grid; output on the fixed grid)."""
    out = affine_warp(jnp.asarray(labels), jnp.asarray(matrix, jnp.float32),
                      tuple(out_shape), order=0)
    return np.asarray(out)
