"""Sliding-window fold-ensemble inference as one jitted XLA program.

Replaces the reference's thread/queue tile pipeline
(`nnunetv2/inference/predict_from_raw_data.py:559-631`): tiles are a static
grid scanned on-device, mirror-TTA flips run as one batched network call
(`:540-557` runs them sequentially), folds are a stacked-parameter
`lax.scan` (`:470-504` reloads state dicts per fold), and Gaussian-weighted
accumulation (`:587-620`) is a dynamic-slice read-modify-write into fp32
accumulators (the reference uses fp16 + an inf guard at `:620-625`).

Everything is shape-static: (tile count, patch size, fold count, flip set)
are compile-time constants per bucketed volume shape, so XLA pipelines the
whole loop on the TPU with no host round-trips.
"""

from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp

from boa_tpu.models.unet import ArchConfig, unet_forward


def mirror_combos(mirror_axes: tuple[int, ...]) -> list[tuple[int, ...]]:
    """All non-empty combinations of spatial flip axes (reference `:551-553`).

    Axes are in our (x, y, z) spatial order, i.e. axes 1..3 of the NXYZC
    activation layout.
    """
    axes = [a + 1 for a in mirror_axes]
    return [c for i in range(len(axes)) for c in itertools.combinations(axes, i + 1)]


def _forward_tta(params, x: jax.Array, cfg: ArchConfig,
                 mirror_axes: tuple[int, ...]) -> jax.Array:
    """Network forward + mirror TTA, batched over flips.

    x: (1, px, py, pz, C) -> (px, py, pz, n_classes), mean over 2^k flips.
    """
    combos = mirror_combos(mirror_axes)
    if combos:
        xs = jnp.concatenate([x] + [jnp.flip(x, c) for c in combos], axis=0)
    else:
        xs = x
    out = unet_forward(params, xs, cfg)  # (M, px, py, pz, ncls)
    if combos:
        parts = [out[0]]
        for i, c in enumerate(combos):
            parts.append(jnp.flip(out[i + 1], tuple(a - 1 for a in c)))
        return sum(parts) / (len(combos) + 1)
    return out[0]


@partial(jax.jit, static_argnames=("cfg", "mirror_axes", "compute_dtype",
                                   "accum_dtype", "normalize"),
         donate_argnums=())
def sliding_window_logits(
    fold_params,            # pytree with leading fold axis F on every leaf
    vol: jax.Array,         # (C, X, Y, Z) fp32, pre-padded to >= patch
    starts: jax.Array,      # (T, 3) int32 tile start coordinates
    gaussian: jax.Array,    # (px, py, pz) fp32 importance map
    cfg: ArchConfig,
    mirror_axes: tuple[int, ...] = (),
    compute_dtype=jnp.bfloat16,
    accum_dtype=jnp.float16,
    normalize: bool = True,
) -> jax.Array:
    """Returns fused logits (n_classes, X, Y, Z), already weight-normalized.

    Accumulators default to fp16, matching the reference's fp16 logit volume
    (`predict_from_raw_data.py:587-620`): at 117 classes × a 512³ grid an
    fp32 volume alone would be ~56 GB of HBM. Per-tile math stays fp32; only
    the resident volumes are fp16.

    normalize=False skips the Gaussian weight-sum volume and the final
    per-voxel division (the reference always divides, `:629`): a per-voxel
    positive scaling is argmax-invariant, so consumers that go straight to
    argmax on this grid (the fused no-resample path) get identical
    segmentations minus one full accumulator's worth of HBM traffic. Do NOT
    use it when the logits are interpolated afterwards — resampling mixes
    neighboring voxels, whose scale factors differ.
    """
    n_ch, X, Y, Z = vol.shape
    px, py, pz = gaussian.shape
    n_cls = cfg.num_classes

    logits0 = jnp.zeros((n_cls, X, Y, Z), accum_dtype)
    weights0 = jnp.zeros((X, Y, Z), accum_dtype) if normalize else None
    gaussian = gaussian.astype(jnp.float32)

    cast_params = jax.tree.map(
        lambda a: a.astype(compute_dtype) if a.dtype == jnp.float32 else a, fold_params)

    def one_tile(carry, start):
        logits, weights = carry
        sx, sy, sz = start[0], start[1], start[2]
        patch = jax.lax.dynamic_slice(vol, (0, sx, sy, sz), (n_ch, px, py, pz))
        x = jnp.transpose(patch, (1, 2, 3, 0))[None].astype(compute_dtype)

        def fold_step(acc, p):
            pred = _forward_tta(p, x, cfg, mirror_axes).astype(jnp.float32)
            return acc + pred, None

        pred_sum, _ = jax.lax.scan(
            fold_step, jnp.zeros((px, py, pz, n_cls), jnp.float32), cast_params)
        n_folds = jax.tree.leaves(fold_params)[0].shape[0]
        pred = jnp.transpose(pred_sum / n_folds, (3, 0, 1, 2)) * gaussian

        cur = jax.lax.dynamic_slice(logits, (0, sx, sy, sz), (n_cls, px, py, pz))
        logits = jax.lax.dynamic_update_slice(
            logits, (cur.astype(jnp.float32) + pred).astype(accum_dtype),
            (0, sx, sy, sz))
        if weights is None:
            return (logits, None), None
        curw = jax.lax.dynamic_slice(weights, (sx, sy, sz), (px, py, pz))
        weights = jax.lax.dynamic_update_slice(
            weights, (curw.astype(jnp.float32) + gaussian).astype(accum_dtype),
            (sx, sy, sz))
        return (logits, weights), None

    (logits, weights), _ = jax.lax.scan(one_tile, (logits0, weights0), starts)
    if weights is None:
        return logits
    return (logits.astype(jnp.float32) /
            weights[None].astype(jnp.float32)).astype(accum_dtype)


def stack_fold_params(fold_params_list: list) -> object:
    """[pytree, ...] -> single pytree with a leading fold axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *fold_params_list)
