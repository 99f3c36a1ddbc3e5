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

from boa_tpu.inference.sliding_window import tile_pred
from boa_tpu.models.unet import ArchConfig


def pad_starts_for_mesh(starts: np.ndarray, n_shards: int
                        ) -> tuple[np.ndarray, np.ndarray]:
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

    def shard_fn(params, vol, starts, valid):
        # mark accumulators as device-varying so scan carries typecheck
        # under shard_map's varying-axis tracking
        logits = jax.lax.pcast(jnp.zeros((n_cls, X, Y, Z), jnp.float32),
                               ("dp",), to="varying")
        weights = jax.lax.pcast(jnp.zeros((X, Y, Z), jnp.float32), ("dp",),
                              to="varying")

        def one_tile(carry, inp):
            logits, weights = carry
            start, ok = inp
            sx, sy, sz = start[0], start[1], start[2]
            pred = jnp.transpose(
                tile_pred(params, vol, start, gauss[..., None] * ok, cfg,
                          mirror_axes, compute_dtype, (px, py, pz),
                          pvary_axes=("dp",)),
                (3, 0, 1, 2))
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


# ---------------------------------------------------------------------------
# chunked tile-sharded fused seg: the multi-chip form of
# sliding_window_seg_chunked (see boa_tpu.inference.sliding_window) — the
# scan-carried accumulator copies its full multi-GB buffer every tile on
# this XLA (CLAUDE.md), so the accumulation runs as unrolled in-place adds
# inside a short sequence of shard_map dispatches instead.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "mesh", "mirror_axes",
                                   "compute_dtype", "k"),
         donate_argnums=(0,))
def _sharded_chunk_step(buf, fold_params, vol, starts_c, valid, gauss, *,
                        cfg, mesh, mirror_axes, compute_dtype, k):
    """One chunk: every chip forwards k tiles and adds them into its own
    partial accumulator slice buf[chip] (leading dp axis, sharded)."""
    n_ch = vol.shape[0]
    px, py, pz = gauss.shape
    n_cls = cfg.num_classes
    cast_params = jax.tree.map(
        lambda a: a.astype(compute_dtype) if a.dtype == jnp.float32 else a,
        fold_params)

    def shard_fn(buf, params, vol, starts, valid):
        starts, valid = starts[0], valid[0]  # local (1, k, …) -> (k, …)

        def fwd(_, inp):
            s, ok = inp
            pred = tile_pred(params, vol, s, gauss[..., None] * ok, cfg,
                             mirror_axes, compute_dtype, (px, py, pz),
                             pvary_axes=("dp",))
            n_pad = buf.shape[-1] - n_cls  # class axis lane-padded like the
            if n_pad:                      # single-chip path
                pred = jnp.pad(pred, ((0, 0),) * 3 + ((0, n_pad),))
            return None, pred.astype(buf.dtype)

        _, ys = jax.lax.scan(fwd, None, (starts, valid))
        ncp = buf.shape[-1]
        for i in range(k):  # straight-line: in-place on the donated buf
            s = starts[i]
            idx = (0, s[0], s[1], s[2], 0)
            cur = jax.lax.dynamic_slice(buf, idx, (1, px, py, pz, ncp))
            buf = jax.lax.dynamic_update_slice(
                buf, (cur.astype(jnp.float32) +
                      ys[i][None].astype(jnp.float32)).astype(buf.dtype), idx)
        return buf

    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P("dp"), P(), P(), P("dp"), P("dp")),
                       out_specs=P("dp"))
    return fn(buf, cast_params, vol, starts_c, valid)


@partial(jax.jit, static_argnames=("n_cls", "seg_dtype"))
def _reduce_argmax(buf, *, n_cls, seg_dtype):
    total = jnp.sum(buf.astype(jnp.float32), axis=0)  # GSPMD all-reduce
    return jnp.argmax(total[..., :n_cls], axis=-1).astype(seg_dtype)


def sliding_window_seg_sharded_chunked(
    fold_params,
    vol: jax.Array,          # (C, X, Y, Z) fp32, pre-padded ≥ patch
    starts: np.ndarray,      # (T, 3) int32 tile starts
    gaussian: np.ndarray,    # (px, py, pz) fp32
    cfg: ArchConfig,
    mesh: Mesh,
    mirror_axes: tuple[int, ...] = (),
    compute_dtype=jnp.bfloat16,
    accum_dtype=jnp.float32,
    seg_dtype=jnp.uint8,
    k: int = 6,
) -> jax.Array:
    """Fused multilabel seg (X, Y, Z) over the mesh's `dp` axis.

    Tiles interleave across chips; each dispatch runs k tiles per chip with
    unrolled in-place accumulation into per-chip partials (leading dp axis,
    sharded); the final jit sums over dp (GSPMD inserts the all-reduce) and
    argmaxes — Gaussian weight normalization is skipped, argmax-invariant."""
    n_dp = mesh.shape["dp"]
    spatial = vol.shape[-3:]
    n_cls = cfg.num_classes
    starts_p, valid = pad_starts_for_mesh(np.asarray(starts, np.int32), n_dp)
    order = np.arange(len(starts_p)).reshape(-1, n_dp).T.reshape(-1)
    starts_p, valid = starts_p[order], valid[order]
    # per-chip tile lists, padded to a multiple of k
    per = len(starts_p) // n_dp
    n_chunks = -(-per // k)
    sh = np.zeros((n_dp, n_chunks * k, 3), np.int32)
    va = np.zeros((n_dp, n_chunks * k), np.float32)
    sh[:, :per] = starts_p.reshape(n_dp, per, 3)
    va[:, :per] = valid.reshape(n_dp, per)

    n_cls_pad = -(-n_cls // 128) * 128  # lane-align the accumulator minor dim
    buf = jax.device_put(
        jnp.zeros((n_dp,) + tuple(spatial) + (n_cls_pad,), accum_dtype),
        NamedSharding(mesh, P("dp")))
    gauss = jnp.asarray(gaussian, jnp.float32)
    for c in range(n_chunks):
        buf = _sharded_chunk_step(
            buf, fold_params, vol, sh[:, c * k:(c + 1) * k],
            va[:, c * k:(c + 1) * k], gauss, cfg=cfg, mesh=mesh,
            mirror_axes=tuple(mirror_axes), compute_dtype=compute_dtype, k=k)

    return _reduce_argmax(buf, n_cls=n_cls, seg_dtype=seg_dtype)


# ---------------------------------------------------------------------------
# z-halo slab sharding (the reference's z triple-split, SPMD-ified)
# ---------------------------------------------------------------------------


def sliding_window_logits_zslab(
    fold_params,
    vol: jax.Array,          # (C, X, Y, Z) fp32, pre-padded ≥ patch
    gaussian: np.ndarray,    # (px, py, pz) fp32
    cfg: ArchConfig,
    mesh: Mesh,
    tile_step_size: float = 0.5,
    margin: int | None = None,
    mirror_axes: tuple[int, ...] = (),
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Volume sharded into z-slabs with halo margins across the `dp` axis.

    The SPMD form of the reference's z triple-split
    (`totalsegmentator/nnunet.py:483-505`: 20-slice margins, per-part
    prediction, crop-margin recombination): each chip extends its slab by
    `margin` slices from the replicated volume, runs the full sliding
    window on the extended slab, and keeps only its interior slice — so
    per-chip logit memory is Z/n_dp instead of Z (scales past HBM), and no
    cross-chip reduction of the logit volume is needed at all (the output
    stays z-sharded; only slab-local tiles contribute, exactly like the
    reference's split parts).
    """
    from boa_tpu.ops import preprocess as pp

    n_dp = mesh.shape["dp"]
    n_ch, X, Y, Z = vol.shape
    px, py, pz = gaussian.shape
    n_cls = cfg.num_classes
    if margin is None:
        margin = pz // 2  # reference uses a fixed 20-slice margin at 1.5 mm

    slab = -(-Z // n_dp)
    z_pad = slab * n_dp - Z
    volp = jnp.pad(vol, ((0, 0),) * 3 + ((0, z_pad),))
    zp = slab * n_dp
    ext = min(slab + 2 * margin, zp)
    ext = max(ext, pz)
    starts_local = pp.tile_starts((X, Y, ext), (px, py, pz), tile_step_size)
    gauss = jnp.asarray(gaussian, jnp.float32)
    starts_j = jnp.asarray(starts_local)

    cast_params = jax.tree.map(
        lambda a: a.astype(compute_dtype) if a.dtype == jnp.float32 else a,
        fold_params)

    def shard_fn(params, volp):
        idx = jax.lax.axis_index("dp")
        lo_want = idx * slab - margin
        lo = jnp.clip(lo_want, 0, zp - ext)
        slab_vol = jax.lax.dynamic_slice(volp, (0, 0, 0, lo),
                                         (n_ch, X, Y, ext))
        logits = jax.lax.pcast(jnp.zeros((n_cls, X, Y, ext), jnp.float32),
                               ("dp",), to="varying")
        weights = jax.lax.pcast(jnp.zeros((X, Y, ext), jnp.float32), ("dp",),
                              to="varying")

        def one_tile(carry, start):
            logits, weights = carry
            sx, sy, sz = start[0], start[1], start[2]
            pred = jnp.transpose(
                tile_pred(params, slab_vol, start, gauss, cfg, mirror_axes,
                          compute_dtype, (px, py, pz), pvary_axes=("dp",)),
                (3, 0, 1, 2))
            cur = jax.lax.dynamic_slice(logits, (0, sx, sy, sz),
                                        (n_cls, px, py, pz))
            logits = jax.lax.dynamic_update_slice(logits, cur + pred,
                                                  (0, sx, sy, sz))
            curw = jax.lax.dynamic_slice(weights, (sx, sy, sz), (px, py, pz))
            weights = jax.lax.dynamic_update_slice(weights, curw + gauss,
                                                   (sx, sy, sz))
            return (logits, weights), None

        (logits, weights), _ = jax.lax.scan(one_tile, (logits, weights),
                                            starts_j)
        fused = logits / jnp.maximum(weights[None], 1e-8)
        # keep the interior slab (crop the halo margin back off)
        inner_lo = idx * slab - lo
        return jax.lax.dynamic_slice(fused, (0, 0, 0, inner_lo),
                                     (n_cls, X, Y, slab))

    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P(), P()),
                       out_specs=P(None, None, None, "dp"))
    out = jax.jit(fn)(cast_params, volp)
    return out[..., :Z]
