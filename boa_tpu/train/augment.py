"""On-device training augmentation, one jitted program per batch.

Parity: the batchgeneratorsv2 pipeline built in
`nnUNetTrainer.get_training_transforms` (`nnUNetTrainer.py:695-845`):
spatial (rotation p=0.2 ±30°, scaling p=0.2 range 0.7–1.4), Gaussian noise
p=0.1, Gaussian blur p=0.2 (σ 0.5–1), multiplicative brightness p=0.15
(0.75–1.25), contrast p=0.15 (range-preserving), simulate-low-resolution
p=0.25 (zoom 0.5–1), gamma (inverted p=0.1, plain p=0.3, range 0.7–1.5),
mirroring (disabled for the NoMirroring trainers all BOA models use).

TPU design: the reference burns CPU worker processes on this
(MultiThreadedAugmenter); here the whole pipeline is jitted JAX — each
transform draws its own key, applies to the full batch, and blends
per-sample with its probability mask, so augmentation runs on-device
overlapped with the optimizer step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- spatial
def _rotation_matrix(angles: jax.Array) -> jax.Array:
    ax, ay, az = angles[0], angles[1], angles[2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


def _sample_trilinear(vol: jax.Array, coords: jax.Array) -> jax.Array:
    """vol (X,Y,Z[,C]), coords (3, X,Y,Z) -> resampled vol."""
    shape = vol.shape[:3]
    c0 = jnp.floor(coords).astype(jnp.int32)
    frac = coords - c0
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ix = jnp.clip(c0[0] + dx, 0, shape[0] - 1)
                iy = jnp.clip(c0[1] + dy, 0, shape[1] - 1)
                iz = jnp.clip(c0[2] + dz, 0, shape[2] - 1)
                w = ((frac[0] if dx else 1 - frac[0])
                     * (frac[1] if dy else 1 - frac[1])
                     * (frac[2] if dz else 1 - frac[2]))
                v = vol[ix, iy, iz]
                out = out + (w[..., None] if vol.ndim == 4 else w) * v
    return out


def _sample_nearest(vol: jax.Array, coords: jax.Array) -> jax.Array:
    shape = vol.shape[:3]
    c0 = jnp.round(coords).astype(jnp.int32)
    ix = jnp.clip(c0[0], 0, shape[0] - 1)
    iy = jnp.clip(c0[1], 0, shape[1] - 1)
    iz = jnp.clip(c0[2], 0, shape[2] - 1)
    return vol[ix, iy, iz]


def _affine_coords(shape, mat: jax.Array) -> jax.Array:
    """(3, X, Y, Z) source coordinates for an affine about the center."""
    center = jnp.array([(s - 1) / 2.0 for s in shape])
    grids = jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) for s in shape],
                         indexing="ij")
    pts = jnp.stack([g - c for g, c in zip(grids, center)])  # (3,X,Y,Z)
    src = jnp.einsum("ij,jxyz->ixyz", mat, pts)
    return src + center[:, None, None, None]


def spatial_transform(key: jax.Array, x: jax.Array, y: jax.Array,
                      p_rotation: float = 0.2, p_scaling: float = 0.2,
                      rot_max: float = 0.5235987755982988,  # 30 deg
                      scale_range: tuple[float, float] = (0.7, 1.4)):
    """Per-sample random rotation+scale; x trilinear, y nearest.

    y may carry trailing seg channels (X, Y, Z, S) — the cascade path
    warps the label map and the previous-stage seg with one transform.
    Singleton-z patches (the 2d configuration) rotate in-plane only, like
    the reference's 2D spatial transform."""
    in_plane_only = x.shape[3] == 1

    def one(key, xi, yi):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        do_rot = jax.random.uniform(k1) < p_rotation
        do_scale = jax.random.uniform(k2) < p_scaling
        angles = jnp.where(do_rot,
                           jax.random.uniform(k3, (3,), minval=-rot_max,
                                              maxval=rot_max),
                           jnp.zeros(3))
        if in_plane_only:
            angles = angles * jnp.array([0.0, 0.0, 1.0])
        scale = jnp.where(do_scale,
                          jax.random.uniform(k4, (), minval=scale_range[0],
                                             maxval=scale_range[1]),
                          1.0)
        mat = _rotation_matrix(angles) * scale
        coords = _affine_coords(yi.shape[:3], mat)
        xo = _sample_trilinear(xi, coords)
        yo = _sample_nearest(yi, coords)
        identity = jnp.logical_not(jnp.logical_or(do_rot, do_scale))
        return (jnp.where(identity, xi, xo),
                jnp.where(identity, yi, yo))

    keys = jax.random.split(key, x.shape[0])
    return jax.vmap(one)(keys, x, y)


# ---------------------------------------------------------------- intensity
def _blend(mask: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.where(mask.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)


def gaussian_noise(key, x, p: float = 0.1, max_var: float = 0.1):
    k1, k2, k3 = jax.random.split(key, 3)
    n = x.shape[0]
    var = jax.random.uniform(k2, (n,), minval=0.0, maxval=max_var)
    noise = jax.random.normal(k3, x.shape) * \
        jnp.sqrt(var).reshape(-1, 1, 1, 1, 1)
    return _blend(jax.random.uniform(k1, (n,)) < p, x + noise, x)


def _gauss_kernel1d(sigma: jax.Array, radius: int = 3) -> jax.Array:
    t = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (t / jnp.maximum(sigma, 1e-3)) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(key, x, p: float = 0.2,
                  sigma_range: tuple[float, float] = (0.5, 1.0)):
    k1, k2 = jax.random.split(key)
    n = x.shape[0]
    # scipy (batchgenerators' backend) truncates at 4*sigma; a fixed 3-tap
    # radius under-blurs the larger sigmas of the DA5 preset. The kernel
    # must stay smaller than the patch on every axis (tiny test patches).
    radius = max(3, int(-(-4.0 * sigma_range[1] // 1)))
    radius = min(radius, (min(x.shape[1:4]) - 1) // 2)

    def one(key, xi):
        sigma = jax.random.uniform(key, (), minval=sigma_range[0],
                                   maxval=sigma_range[1])
        k = _gauss_kernel1d(sigma, radius)
        for ax in range(3):
            shape = [1, 1, 1]
            shape[ax] = k.shape[0]
            xi = jax.scipy.signal.convolve(
                xi, k.reshape(shape)[..., None], mode="same")
        return xi

    keys = jax.random.split(k2, n)
    blurred = jax.vmap(one)(keys, x)
    return _blend(jax.random.uniform(k1, (n,)) < p, blurred, x)


def brightness(key, x, p: float = 0.15,
               rng: tuple[float, float] = (0.75, 1.25)):
    k1, k2 = jax.random.split(key)
    n = x.shape[0]
    mult = jax.random.uniform(k2, (n, 1, 1, 1, 1), minval=rng[0],
                              maxval=rng[1])
    return _blend(jax.random.uniform(k1, (n,)) < p, x * mult, x)


def contrast(key, x, p: float = 0.15,
             rng: tuple[float, float] = (0.75, 1.25)):
    """Range-preserving contrast (batchgenerators ContrastTransform)."""
    k1, k2 = jax.random.split(key)
    n = x.shape[0]
    factor = jax.random.uniform(k2, (n, 1, 1, 1, 1), minval=rng[0],
                                maxval=rng[1])
    axes = (1, 2, 3)
    mean = jnp.mean(x, axes, keepdims=True)
    mn = jnp.min(x, axes, keepdims=True)
    mx = jnp.max(x, axes, keepdims=True)
    out = jnp.clip((x - mean) * factor + mean, mn, mx)
    return _blend(jax.random.uniform(k1, (n,)) < p, out, x)


def simulate_low_resolution(key, x, p: float = 0.25,
                            zoom_range: tuple[float, float] = (0.5, 1.0),
                            n_levels: int = 4):
    """Down-then-up sample (SimulateLowResolutionTransform: nearest
    downsample, smooth upsample). The continuous zoom factor is quantized
    to `n_levels` static levels so every branch has static shapes
    (jit-compatible); `lax.switch` picks the sampled level per sample."""
    k1, k2 = jax.random.split(key)
    n = x.shape[0]
    spatial = x.shape[1:4]
    lo, hi = zoom_range
    # the reference samples zoom uniformly on [lo, hi) where exactly hi
    # (identity) has measure zero — keep hi out of the level grid, else
    # the effective apply probability drops to p * (n_levels-1) / n_levels
    levels = [lo + (hi - lo) * i / n_levels for i in range(n_levels)]

    def one(key, xi):
        idx = jax.random.randint(key, (), 0, n_levels)

        def make_branch(z):
            def branch(v):
                if z >= 0.999:
                    return v
                small = tuple(max(1, int(round(s * z))) for s in spatial)
                down = jax.image.resize(v, (*small, v.shape[-1]),
                                        method="nearest")
                return jax.image.resize(down, v.shape, method="cubic")
            return branch

        return jax.lax.switch(idx, [make_branch(z) for z in levels], xi)

    keys = jax.random.split(k2, n)
    return _blend(jax.random.uniform(k1, (n,)) < p,
                  jax.vmap(one)(keys, x), x)


def gamma(key, x, p: float = 0.3, rng: tuple[float, float] = (0.7, 1.5),
          invert: bool = False):
    """GammaTransform with retain_stats (nnU-Net default)."""
    k1, k2 = jax.random.split(key)
    n = x.shape[0]
    g = jax.random.uniform(k2, (n, 1, 1, 1, 1), minval=rng[0], maxval=rng[1])
    axes = (1, 2, 3)
    xin = -x if invert else x
    mn = jnp.min(xin, axes, keepdims=True)
    span = jnp.maximum(jnp.max(xin, axes, keepdims=True) - mn, 1e-7)
    mean = jnp.mean(xin, axes, keepdims=True)
    std = jnp.std(xin, axes, keepdims=True)
    out = jnp.power((xin - mn) / span, g) * span + mn
    # retain stats
    out = (out - jnp.mean(out, axes, keepdims=True)) / \
        jnp.maximum(jnp.std(out, axes, keepdims=True), 1e-7) * std + mean
    out = -out if invert else out
    return _blend(jax.random.uniform(k1, (n,)) < p, out, x)


def mirror(key, x, y, axes: tuple[int, ...] = (0, 1, 2), p: float = 0.5):
    """Per-sample per-axis flips (disabled for NoMirroring trainers)."""
    def one(key, xi, yi):
        ks = jax.random.split(key, len(axes))
        for k, ax in zip(ks, axes):
            do = jax.random.uniform(k) < p
            xi = jnp.where(do, jnp.flip(xi, ax), xi)
            yi = jnp.where(do, jnp.flip(yi, ax), yi)
        return xi, yi

    keys = jax.random.split(key, x.shape[0])
    return jax.vmap(one)(keys, x, y)


# ---------------------------------------------------------------- pipeline
@partial(jax.jit, static_argnames=("mirror_axes",))
def augment_batch(key: jax.Array, x: jax.Array, y: jax.Array,
                  mirror_axes: tuple[int, ...] = ()):
    """The full nnU-Net training transform stack, one device program.

    x: (N, X, Y, Z, C) fp32 normalized, y: (N, X, Y, Z) int.
    """
    keys = jax.random.split(key, 9)
    x, y = spatial_transform(keys[0], x, y)
    x = gaussian_noise(keys[1], x)
    x = gaussian_blur(keys[2], x)
    x = brightness(keys[3], x)
    x = contrast(keys[4], x)
    x = simulate_low_resolution(keys[5], x)
    x = gamma(keys[6], x, p=0.1, invert=True)
    x = gamma(keys[7], x, p=0.3, invert=False)
    if mirror_axes:
        x, y = mirror(keys[8], x, y, axes=mirror_axes)
    return x, y.astype(jnp.int32)


# ---------------------------------------------------------------- DA5 preset
@partial(jax.jit, static_argnames=("mirror_axes",))
def augment_batch_da5(key: jax.Array, x: jax.Array, y: jax.Array,
                      mirror_axes: tuple[int, ...] = (0, 1, 2)):
    """Aggressive DA5 variant (`variants/data_augmentation/
    nnUNetTrainerDA5.py`): wider rotations/scales and higher transform
    probabilities than the default stack."""
    keys = jax.random.split(key, 9)
    x, y = spatial_transform(keys[0], x, y, p_rotation=0.6, p_scaling=0.6,
                             rot_max=0.9599310885968813,  # 55 deg
                             scale_range=(0.6, 1.6))
    x = gaussian_noise(keys[1], x, p=0.3, max_var=0.15)
    x = gaussian_blur(keys[2], x, p=0.3, sigma_range=(0.3, 1.5))
    x = brightness(keys[3], x, p=0.3, rng=(0.65, 1.35))
    x = contrast(keys[4], x, p=0.3, rng=(0.65, 1.35))
    x = simulate_low_resolution(keys[5], x, p=0.4, zoom_range=(0.4, 1.0))
    x = gamma(keys[6], x, p=0.15, rng=(0.6, 1.6), invert=True)
    x = gamma(keys[7], x, p=0.4, rng=(0.6, 1.6), invert=False)
    if mirror_axes:
        x, y = mirror(keys[8], x, y, axes=mirror_axes)
    return x, y.astype(jnp.int32)


# ------------------------------------------------------------- cascade stack
def _binary_noise(key: jax.Array, onehot: jax.Array, p: float = 0.4,
                  max_radius: int = 8) -> jax.Array:
    """Random per-channel binary dilation/erosion of one-hot cascade inputs.

    Parity: `ApplyRandomBinaryOperatorTransform` wrapped at p=0.4 with
    strel_size (1, 8) (`nnUNetTrainer.py:811-819`): each one-hot channel
    independently, with probability p, gets dilated or eroded by a random
    radius in [1, max_radius]. A radius-r ball op runs as r iterations of
    the 3-cube op (outside-the-patch treated as background, like scipy's
    border_value=0).

    onehot: (X, Y, Z, F) float 0/1 for ONE sample (vmap over the batch).
    """
    n_f = onehot.shape[-1]
    k1, k2, k3 = jax.random.split(key, 3)
    apply = jax.random.uniform(k1, (n_f,)) < p
    dilate = jax.random.uniform(k2, (n_f,)) < 0.5
    radius = jax.random.randint(k3, (n_f,), 1, max_radius + 1)

    def pool(v, sign):
        # max-pool of sign*v with zero border = dilation (sign=+1) or
        # erosion (sign=-1, since min(v) == -max(-v)) over the 3-cube
        vp = jnp.pad(sign * v, ((1, 1),) * 3 + ((0, 0),))
        m = jax.lax.reduce_window(vp, -jnp.inf, jax.lax.max,
                                  (3, 3, 3, 1), (1, 1, 1, 1), "VALID")
        return sign * m

    def body(i, v):
        active = (i < radius) & apply                       # (F,)
        stepped = jnp.where(dilate, pool(v, 1.0), pool(v, -1.0))
        return jnp.where(active, stepped, v)

    return jax.lax.fori_loop(0, max_radius, body, onehot)


@partial(jax.jit, static_argnames=("fg_labels", "mirror_axes"))
def augment_batch_cascade(key: jax.Array, x: jax.Array, y: jax.Array,
                          prev: jax.Array, fg_labels: tuple[int, ...],
                          mirror_axes: tuple[int, ...] = ()):
    """Cascade training transforms (`nnUNetTrainer.py:802-829`):
    the default stack, plus the previous-stage seg warped with the SAME
    spatial transform (nearest), one-hotted over `fg_labels`
    (MoveSegAsOneHotToDataTransform), per-channel binary dilate/erode
    noise (p=0.4), and mirroring applied to data+one-hot+label together.

    The reference's RemoveRandomConnectedComponentFromOneHot (p=0.2) is
    connected-components work and runs on the HOST patch in the cascade
    DataLoader (`dataloader.cascade_component_dropout`) before upload —
    a documented reordering (noise before instead of after the spatial
    transform), statistically equivalent for augmentation purposes.

    x: (N,X,Y,Z,C), y/prev: (N,X,Y,Z) int. Returns (x', y') with
    x' carrying C + len(fg_labels) channels.
    """
    keys = jax.random.split(key, 10)
    segs = jnp.stack([y, prev], axis=-1)
    x, segs = spatial_transform(keys[0], x, segs)
    y, prev = segs[..., 0], segs[..., 1]
    x = gaussian_noise(keys[1], x)
    x = gaussian_blur(keys[2], x)
    x = brightness(keys[3], x)
    x = contrast(keys[4], x)
    x = simulate_low_resolution(keys[5], x)
    x = gamma(keys[6], x, p=0.1, invert=True)
    x = gamma(keys[7], x, p=0.3, invert=False)
    onehot = jnp.stack([(prev == lb) for lb in fg_labels],
                       axis=-1).astype(x.dtype)
    onehot = jax.vmap(_binary_noise)(
        jax.random.split(keys[8], x.shape[0]), onehot)
    x = jnp.concatenate([x, onehot], axis=-1)
    if mirror_axes:
        x, y = mirror(keys[9], x, y, axes=mirror_axes)
    return x, y.astype(jnp.int32)
