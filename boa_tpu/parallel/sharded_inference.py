"""Multi-chip sliding-window inference: tile grid sharded over the mesh.

The reference scales big volumes with a manual z triple-split + 20-slice
halos on one GPU (`totalsegmentator/nnunet.py:483-505`) and shards whole
files across processes (`num_parts/part_id`,
`predict_from_raw_data.py:918-925`). The TPU-native equivalent: the
sliding-window TILE GRID is the parallel axis — each chip of a `dp` mesh
runs the fold-ensemble forward on an interleaved subset of tiles,
accumulates Gaussian-weighted logits into its own full-size volume, and a
single `psum` fuses the partial volumes (overlaps included, since the
Gaussian weights sum identically). No halos are needed because every tile
reads the replicated input volume; ICI carries one all-reduce of the
logit volume at the end.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from boa_tpu.inference.sliding_window import _forward_tta
from boa_tpu.models.unet import ArchConfig


def pad_starts_for_mesh(starts: np.ndarray, n_shards: int) -> np.ndarray:
    """Pad the (T, 3) tile-start list so T divides the mesh: padding tiles
    repeat the first start — their contribution is identical weights added
    to the same voxels, which cancels in the weighted normalization only
    if masked, so we mask them with a validity flag instead."""
    t = len(starts)
    t_pad = -(-t // n_shards) * n_shards
    valid = np.ones((t_pad,), np.float32)
    if t_pad != t:
        starts = np.concatenate(
            [starts, np.repeat(starts[:1], t_pad - t, axis=0)])
        valid[t:] = 0.0
    return starts, valid


def sliding_window_logits_sharded(
    fold_params,
    vol: jax.Array,          # (C, X, Y, Z) fp32, pre-padded ≥ patch
    starts: np.ndarray,      # (T, 3) int32 tile starts
    gaussian: np.ndarray,    # (px, py, pz) fp32
    cfg: ArchConfig,
    mesh: Mesh,
    mirror_axes: tuple[int, ...] = (),
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Fused logits (n_classes, X, Y, Z) computed across the mesh's `dp`
    axis. Compiles and runs on an N-device CPU mesh for testing."""
    n_dp = mesh.shape["dp"]
    starts_p, valid = pad_starts_for_mesh(np.asarray(starts, np.int32), n_dp)
    n_ch, X, Y, Z = vol.shape
    px, py, pz = gaussian.shape
    n_cls = cfg.num_classes

    # interleave tiles over shards so work is balanced
    order = np.arange(len(starts_p)).reshape(-1, n_dp).T.reshape(-1)
    starts_sh = jnp.asarray(starts_p[order])
    valid_sh = jnp.asarray(valid[order])
    gauss = jnp.asarray(gaussian, jnp.float32)

    cast_params = jax.tree.map(
        lambda a: a.astype(compute_dtype) if a.dtype == jnp.float32 else a,
        fold_params)
    n_folds = jax.tree.leaves(fold_params)[0].shape[0]

    def shard_fn(params, vol, starts, valid):
        # mark accumulators as device-varying so scan carries typecheck
        # under shard_map's varying-axis tracking
        logits = jax.lax.pvary(jnp.zeros((n_cls, X, Y, Z), jnp.float32),
                               ("dp",))
        weights = jax.lax.pvary(jnp.zeros((X, Y, Z), jnp.float32), ("dp",))

        def one_tile(carry, inp):
            logits, weights = carry
            start, ok = inp
            sx, sy, sz = start[0], start[1], start[2]
            patch = jax.lax.dynamic_slice(vol, (0, sx, sy, sz),
                                          (n_ch, px, py, pz))
            x = jnp.transpose(patch, (1, 2, 3, 0))[None].astype(compute_dtype)

            def fold_step(acc, pr):
                return acc + _forward_tta(pr, x, cfg, mirror_axes).astype(
                    jnp.float32), None

            pred_sum, _ = jax.lax.scan(
                fold_step,
                jax.lax.pvary(jnp.zeros((px, py, pz, n_cls), jnp.float32),
                              ("dp",)),
                params)
            pred = jnp.transpose(pred_sum / n_folds, (3, 0, 1, 2)) \
                * gauss * ok
            cur = jax.lax.dynamic_slice(logits, (0, sx, sy, sz),
                                        (n_cls, px, py, pz))
            logits = jax.lax.dynamic_update_slice(logits, cur + pred,
                                                  (0, sx, sy, sz))
            curw = jax.lax.dynamic_slice(weights, (sx, sy, sz), (px, py, pz))
            weights = jax.lax.dynamic_update_slice(
                weights, curw + gauss * ok, (sx, sy, sz))
            return (logits, weights), None

        (logits, weights), _ = jax.lax.scan(one_tile, (logits, weights),
                                            (starts, valid))
        # fuse partial volumes across chips
        logits = jax.lax.psum(logits, "dp")
        weights = jax.lax.psum(weights, "dp")
        return logits / jnp.maximum(weights[None], 1e-8)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P("dp"), P("dp")),
        out_specs=P())
    return jax.jit(fn)(cast_params, vol, starts_sh, valid_sh)
