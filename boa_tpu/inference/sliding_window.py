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


def tiles_pred(cast_params, vol, starts_tb, gauss_w, cfg: ArchConfig,
               compute_dtype, patch_shape,
               pvary_axes: tuple[str, ...] = ()) -> jax.Array:
    """Gauss-weighted fold-ensemble prediction of a BATCH of tiles.

    The shared forward body of every sliding-window variant: dynamic-slice
    one patch per row of `starts_tb` ((tb, 3) int32), stack as the batch
    dim of one NXYZC forward per fold (folds==1 skips the fold scan's
    zeros-init+add pass), mean over folds, multiply by `gauss_w`
    (broadcastable against (tb, px, py, pz, 1) — the per-tile validity
    mask rides in it). Returns (tb, px, py, pz, n_cls) fp32. No mirror
    TTA here: the flip batching in _forward_tta owns the batch dim, so
    TTA plans go through tile_pred's batch-1 wrapper instead.
    `pvary_axes` marks the fold accumulator device-varying inside
    shard_map bodies.
    """
    px, py, pz = patch_shape
    n_ch = vol.shape[0]
    n_cls = cfg.num_classes
    tb = starts_tb.shape[0]
    x = jnp.stack([
        jax.lax.dynamic_slice(
            vol, (0, starts_tb[i, 0], starts_tb[i, 1], starts_tb[i, 2]),
            (n_ch, px, py, pz))
        for i in range(tb)])
    x = jnp.transpose(x, (0, 2, 3, 4, 1)).astype(compute_dtype)
    n_folds = jax.tree.leaves(cast_params)[0].shape[0]
    if n_folds == 1:
        pred = unet_forward(jax.tree.map(lambda a: a[0], cast_params),
                            x, cfg).astype(jnp.float32)
    else:
        def fold_step(acc, p):
            return acc + unet_forward(p, x, cfg).astype(jnp.float32), None

        zero = jnp.zeros((tb, px, py, pz, n_cls), jnp.float32)
        if pvary_axes:
            zero = jax.lax.pcast(zero, pvary_axes, to="varying")
        pred, _ = jax.lax.scan(fold_step, zero, cast_params)
        pred = pred / n_folds
    return pred * gauss_w


def tile_pred(cast_params, vol, start, gauss_w, cfg: ArchConfig,
              mirror_axes, compute_dtype, patch_shape,
              pvary_axes: tuple[str, ...] = ()) -> jax.Array:
    """Gauss-weighted fold-ensemble prediction of ONE tile.

    Delegates to tiles_pred with a batch of one when the plan has no
    mirror TTA (identical math — the forward already ran with a leading
    batch-1 dim); TTA plans keep the flip-batched body here. `gauss_w` is
    (px,py,pz) or (px,py,pz,1), already scaled by any validity mask.
    Returns (px, py, pz, n_cls) fp32.
    """
    if gauss_w.ndim == 3:
        gauss_w = gauss_w[..., None]
    if not mirror_axes:
        return tiles_pred(cast_params, vol, start[None], gauss_w, cfg,
                          compute_dtype, patch_shape,
                          pvary_axes=pvary_axes)[0]
    px, py, pz = patch_shape
    n_ch = vol.shape[0]
    n_cls = cfg.num_classes
    patch = jax.lax.dynamic_slice(vol, (0, start[0], start[1], start[2]),
                                  (n_ch, px, py, pz))
    x = jnp.transpose(patch, (1, 2, 3, 0))[None].astype(compute_dtype)
    n_folds = jax.tree.leaves(cast_params)[0].shape[0]
    if n_folds == 1:
        pred = _forward_tta(jax.tree.map(lambda a: a[0], cast_params),
                            x, cfg, mirror_axes).astype(jnp.float32)
    else:
        def fold_step(acc, p):
            return acc + _forward_tta(p, x, cfg, mirror_axes
                                      ).astype(jnp.float32), None

        zero = jnp.zeros((px, py, pz, n_cls), jnp.float32)
        if pvary_axes:
            zero = jax.lax.pcast(zero, pvary_axes, to="varying")
        pred, _ = jax.lax.scan(fold_step, zero, cast_params)
        pred = pred / n_folds
    return pred * gauss_w


def sliding_window_acc(
    fold_params,            # pytree with leading fold axis F on every leaf
    vol: jax.Array,         # (C, X, Y, Z) fp32, pre-padded to >= patch
    starts: jax.Array,      # (T, 3) int32 tile start coordinates
    gaussian: jax.Array,    # (px, py, pz) fp32 importance map
    cfg: ArchConfig,
    mirror_axes: tuple[int, ...] = (),
    compute_dtype=jnp.bfloat16,
    accum_dtype=jnp.float16,
    normalize: bool = True,
):
    """Channels-LAST accumulation core: (logits (X,Y,Z,n_cls), weights|None).

    The accumulator lives in the network's native NXYZC layout: tile
    predictions slot in without the two full-patch transposes the
    channels-first layout needed (≈2 GB of HBM traffic per tile at 118
    classes), and the minor dim is the class axis (118→128 lane pad)
    instead of a ragged Z extent. Trace inside an enclosing jit.

    normalize=False skips the Gaussian weight-sum volume and the final
    per-voxel division (the reference always divides,
    `predict_from_raw_data.py:629`): a per-voxel positive scaling is
    argmax-invariant, so consumers that go straight to argmax on this grid
    get identical segmentations minus one accumulator's worth of traffic.
    Do NOT use it when the logits are interpolated afterwards — resampling
    mixes neighboring voxels, whose scale factors differ.
    """
    n_ch, X, Y, Z = vol.shape
    px, py, pz = gaussian.shape
    n_cls = cfg.num_classes

    logits0 = jnp.zeros((X, Y, Z, n_cls), accum_dtype)
    weights0 = jnp.zeros((X, Y, Z), accum_dtype) if normalize else None
    gaussian = gaussian.astype(jnp.float32)

    cast_params = jax.tree.map(
        lambda a: a.astype(compute_dtype) if a.dtype == jnp.float32 else a, fold_params)

    def one_tile(carry, start):
        logits, weights = carry
        sx, sy, sz = start[0], start[1], start[2]
        pred = tile_pred(cast_params, vol, start, gaussian, cfg, mirror_axes,
                         compute_dtype, (px, py, pz))

        cur = jax.lax.dynamic_slice(logits, (sx, sy, sz, 0), (px, py, pz, n_cls))
        logits = jax.lax.dynamic_update_slice(
            logits, (cur.astype(jnp.float32) + pred).astype(accum_dtype),
            (sx, sy, sz, 0))
        if weights is None:
            return (logits, None), None
        curw = jax.lax.dynamic_slice(weights, (sx, sy, sz), (px, py, pz))
        weights = jax.lax.dynamic_update_slice(
            weights, (curw.astype(jnp.float32) + gaussian).astype(accum_dtype),
            (sx, sy, sz))
        return (logits, weights), None

    (logits, weights), _ = jax.lax.scan(one_tile, (logits0, weights0), starts)
    return logits, weights


@partial(jax.jit, static_argnames=("cfg", "mirror_axes", "compute_dtype",
                                   "accum_dtype", "normalize"),
         donate_argnums=())
def sliding_window_logits(
    fold_params,
    vol: jax.Array,
    starts: jax.Array,
    gaussian: jax.Array,
    cfg: ArchConfig,
    mirror_axes: tuple[int, ...] = (),
    compute_dtype=jnp.bfloat16,
    accum_dtype=jnp.float16,
    normalize: bool = True,
) -> jax.Array:
    """Returns fused logits (n_classes, X, Y, Z), weight-normalized.

    Accumulators default to fp16, matching the reference's fp16 logit volume
    (`predict_from_raw_data.py:587-620`): at 117 classes × a 512³ grid an
    fp32 volume alone would be ~56 GB of HBM. Per-tile math stays fp32; only
    the resident volumes are fp16. The single final transpose from the
    channels-last accumulation layout replaces a per-tile one.
    """
    logits, weights = sliding_window_acc(
        fold_params, vol, starts, gaussian, cfg, mirror_axes, compute_dtype,
        accum_dtype, normalize)
    if weights is not None:
        logits = (logits.astype(jnp.float32) /
                  weights[..., None].astype(jnp.float32)).astype(accum_dtype)
    return jnp.transpose(logits, (3, 0, 1, 2))


def stack_fold_params(fold_params_list: list) -> object:
    """[pytree, ...] -> single pytree with a leading fold axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *fold_params_list)


# ---------------------------------------------------------------------------
# Chunked accumulation: the fast path for fused argmax inference.
#
# Measured on v5e (see CLAUDE.md): a dynamic-update-slice carried through
# `lax.scan`/`fori_loop` is NOT updated in place by this XLA — every tile
# paid a full copy of the multi-GB logit volume (~12-22 ms/tile on the 118-
# class fast-total accumulator, vs ~30 ms for the network forward itself).
# Straight-line (unrolled) updates ARE in-place, provided the minor dim of
# the accumulator is lane-aligned (classes padded to a multiple of 128).
#
# So the fused path runs as a short sequence of dispatches sharing ONE
# compiled program: each `_chunk_step` call scans the network forward over K
# tiles (stacking K gauss-weighted predictions), then applies K *unrolled*
# dynamic-index adds into the donated accumulator. The accumulator is
# channels-last with the class axis padded to 128 lanes when it fits the
# HBM budget (`_chunk_argmax` slices the real classes back out before
# reducing). When it does not fit (full-res total: 25 classes on a
# 512x512x600 grid would pad to a 40 GB channels-last buffer), the window
# streams over z-ROWS instead: tiles sharing a z-start accumulate into a
# channels-first (n_cls, X, Y, pz) row buffer whose updates are
# full-minor-dim (z offset always 0 -> in-place like the lane-aligned
# case), and rows are fused by overlap-add — `_row_finalize` emits the
# argmax of the z-range no later row touches and rolls the remainder into
# a carry buffer. This removes the per-tile copy of the multi-GB
# channels-first accumulator that a whole-volume dynamic_update_slice at
# unaligned z offsets costs on this XLA (measured 12-22 ms/tile).
# ---------------------------------------------------------------------------

# ys-stack HBM budget for auto chunk sizing (measured on v5e, full-res
# total 512x512x600: one 25-tile dispatch per z-row at 2.6 GB ys beats
# 5 dispatches of 6 at 34->28.6 ms/tile — chunk-padding waste and the
# ~30 ms per-dispatch tunnel latency dominate, so pick the fewest
# equal-size chunks whose prediction stack fits this budget)
_YS_BUDGET_BYTES = 4e9


def _auto_chunk(n_tiles: int, tile_bytes: float,
                budget: float = _YS_BUDGET_BYTES) -> int:
    """Fewest equalized chunks with k*tile_bytes <= budget: minimizes both
    dispatch count and padded-tile waste (waste < n_chunks tiles)."""
    k_max = max(1, int(budget // max(tile_bytes, 1.0)))
    n_chunks = -(-n_tiles // k_max)
    return -(-n_tiles // n_chunks)


def _pad_classes(n_cls: int) -> int:
    return -(-n_cls // 128) * 128


@partial(jax.jit, static_argnames=("cfg", "mirror_axes", "compute_dtype",
                                   "k", "channels_last", "n_cls_pad",
                                   "xy_static", "tile_batch"),
         donate_argnums=(0,))
def _chunk_step(buf, fold_params, vol, starts_c, valid, gaussian, z_base, *,
                cfg, mirror_axes, compute_dtype, k, channels_last, n_cls_pad,
                xy_static=None, tile_batch=1):
    """Forward K tiles (scan) + K unrolled in-place adds into `buf`.

    buf: (X,Y,Z,n_cls_pad) if channels_last else (n_cls,X,Y,pz), donated
    (its dtype IS the accumulation dtype). starts_c: (K,3) int32; valid:
    (K,) fp32 0/1 mask for padding tiles of the last chunk (their
    prediction is zeroed, the forward still runs). The network always reads
    the tile at its absolute start; the accumulator update rebases z by
    `z_base` (0 for a whole-volume buf, the row's z-start in row mode).

    xy_static: row-mode fast path — a K-tuple of compile-time (x, y) tile
    starts. All tiles of a z-row share z_base and the xy grid repeats per
    row, so the accumulator updates become STATIC-index updates (the whole
    index (0, x, y, 0) is constant): measured on v5e this drops the update
    overhead from 2.2 ms/tile (dynamic-index chain: XLA re-materializes
    window-sized copies, 31 GB accessed for a 25-tile row) to near the
    ~0.4 ms read+add+write floor. The forward scan keeps the traced
    starts_c (dynamic READS don't copy); only the updates use the static
    coordinates, which must match starts_c[:, :2].
    """
    px, py, pz = gaussian.shape
    n_cls = cfg.num_classes
    gaussian = gaussian.astype(jnp.float32)
    cast_params = jax.tree.map(
        lambda a: a.astype(compute_dtype) if a.dtype == jnp.float32 else a,
        fold_params)

    if tile_batch > 1:
        # Batched-tile forward: at small-z patches (the BCA 160x160x48
        # shape) one tile under-fills the MXU — batch=2 measured 27.96
        # ms/tile vs 39.75 at batch=1 (tools/bca_roofline.py; at 128³ the
        # same batching LOSES, so this is opt-in per shape). Requires no
        # mirror TTA (the flip batching in _forward_tta assumes batch 1)
        # and k % tile_batch == 0 (run_chunks rounds the chunk up).
        assert not mirror_axes and k % tile_batch == 0

        def fwdb(_, inp):
            s, v = inp                    # (tb, 3), (tb,)
            gw = gaussian[None, ..., None] * v[:, None, None, None, None]
            pred = tiles_pred(cast_params, vol, s, gw, cfg, compute_dtype,
                              (px, py, pz))
            if channels_last:
                pred = jnp.pad(pred,
                               ((0, 0),) * 4 + ((0, n_cls_pad - n_cls),))
            else:
                pred = jnp.transpose(pred, (0, 4, 1, 2, 3))
            return None, pred.astype(buf.dtype)

        _, ys = jax.lax.scan(
            fwdb, None, (starts_c.reshape(k // tile_batch, tile_batch, 3),
                         valid.reshape(k // tile_batch, tile_batch)))
        ys = ys.reshape((k,) + ys.shape[2:])
    else:
        def fwd(_, inp):
            s, v = inp
            pred = tile_pred(cast_params, vol, s, gaussian[..., None] * v,
                             cfg, mirror_axes, compute_dtype, (px, py, pz))
            if channels_last:
                pred = jnp.pad(pred,
                               ((0, 0),) * 3 + ((0, n_cls_pad - n_cls),))
            else:
                pred = jnp.transpose(pred, (3, 0, 1, 2))
            return None, pred.astype(buf.dtype)

        _, ys = jax.lax.scan(fwd, None, (starts_c, valid))

    win = (px, py, pz, n_cls_pad) if channels_last else (n_cls, px, py, pz)
    for i in range(k):  # straight-line: XLA updates the donated buf in place
        if xy_static is not None:
            sx, sy = xy_static[i]
            idx = (0, sx, sy, 0)
        else:
            s = starts_c[i]
            idx = (s[0], s[1], s[2] - z_base, 0) if channels_last \
                else (0, s[0], s[1], s[2] - z_base)
        cur = jax.lax.dynamic_slice(buf, idx, win)
        buf = jax.lax.dynamic_update_slice(
            buf, (cur.astype(jnp.float32) + ys[i].astype(jnp.float32)
                  ).astype(buf.dtype), idx)
    return buf


@partial(jax.jit, static_argnames=("n_cls", "revert", "channels_last",
                                   "seg_dtype"))
def _chunk_argmax(buf, *, n_cls, revert, channels_last, seg_dtype):
    """argmax over the real classes of the (possibly padded) accumulator."""
    rv = tuple(slice(b, e) for b, e in revert)
    if channels_last:
        return jnp.argmax(buf[rv + (slice(0, n_cls),)], axis=-1
                          ).astype(seg_dtype)
    return jnp.argmax(buf[(slice(None),) + rv], axis=0).astype(seg_dtype)


@partial(jax.jit, static_argnames=("d", "seg_dtype"), donate_argnums=(0, 1))
def _row_finalize(rowbuf, carry, *, d, seg_dtype):
    """Overlap-add one z-row: argmax-emit the first `d` z-slices (which no
    later row touches), roll the rest into the carry for the next row, and
    hand back a zeroed row buffer (reusing the donated memory)."""
    head = rowbuf[..., :d].astype(jnp.float32) + carry[..., :d].astype(jnp.float32)
    seg = jnp.argmax(head, axis=0).astype(seg_dtype)
    tail = (rowbuf[..., d:].astype(jnp.float32) +
            carry[..., d:].astype(jnp.float32)).astype(carry.dtype)
    new_carry = jnp.pad(tail, ((0, 0),) * 3 + ((0, d),))
    return seg, new_carry, jnp.zeros_like(rowbuf)


@partial(jax.jit, static_argnames=("seg_dtype",))
def _row_finalize_last(rowbuf, carry, *, seg_dtype):
    # no donation: the only output is the small uint8 seg, so neither
    # float32 input can be aliased (donating them only triggered XLA's
    # "donated buffers were not usable" warning; the caller drops both
    # references right after this call anyway)
    total = rowbuf.astype(jnp.float32) + carry.astype(jnp.float32)
    return jnp.argmax(total, axis=0).astype(seg_dtype)


def sliding_window_seg_chunked(
    fold_params, vol, starts: "np.ndarray", gaussian, cfg: ArchConfig,
    mirror_axes=(), compute_dtype=jnp.bfloat16, accum_dtype=jnp.float16,
    seg_dtype=jnp.uint8, revert=None, k: int | None = None,
    accum_budget_bytes: float = 6e9, tile_batch: int = 1):
    """Fused sliding-window -> argmax via chunked in-place accumulation.

    vol: (C,X,Y,Z) normalized+padded device array. starts: host (T,3) int32.
    revert: per-axis (begin, end) of the unpadded region. `k` (tiles per
    dispatch) defaults to the auto policy `_auto_chunk`; all dispatches
    share one compiled program per bucketed shape. Skipping the Gaussian
    weight normalization is argmax-exact (see sliding_window_acc).
    """
    import numpy as np

    n_cls = cfg.num_classes
    n_cls_pad = _pad_classes(n_cls)
    spatial = vol.shape[-3:]
    if revert is None:
        revert = tuple((0, n) for n in spatial)
    gaussian = jnp.asarray(gaussian)
    starts = np.asarray(starts, np.int32)
    channels_last = (float(np.prod(spatial)) * n_cls_pad *
                     jnp.dtype(accum_dtype).itemsize) <= accum_budget_bytes

    tile_bytes = (float(np.prod(gaussian.shape)) *
                  (n_cls_pad if channels_last else n_cls) *
                  jnp.dtype(accum_dtype).itemsize)

    def run_chunks(buf, row_starts, z_base, static_xy=False):
        # per-chunk starts/valid stay host numpy: they ride along with the
        # dispatch instead of costing two device-slice round trips per
        # chunk (~30 ms each through the tunnel)
        T = len(row_starts)
        kk = k if k is not None else _auto_chunk(T, tile_bytes)
        if tile_batch > 1:  # chunk must split evenly into tile batches
            kk = -(-kk // tile_batch) * tile_batch
        n_chunks = -(-T // kk)
        starts_pad = np.full((n_chunks * kk, 3), z_base, np.int32)
        if static_xy:  # padded tiles add zeros at a static (0, 0) corner
            starts_pad[:, :2] = 0
        starts_pad[:T] = row_starts
        valid = np.zeros((n_chunks * kk,), np.float32)
        valid[:T] = 1.0
        for c in range(n_chunks):
            sl = slice(c * kk, (c + 1) * kk)
            # row mode: the xy grid repeats every z-row, so baking the
            # update coordinates into the program keeps ONE compile per
            # chunk position while making every accumulator update a
            # static-index (true in-place) op — see _chunk_step
            xy = tuple(map(tuple, starts_pad[sl, :2].tolist())) \
                if static_xy else None
            buf = _chunk_step(
                buf, fold_params, vol, starts_pad[sl],
                valid[sl], gaussian, np.int32(z_base),
                cfg=cfg, mirror_axes=tuple(mirror_axes),
                compute_dtype=compute_dtype, k=kk,
                channels_last=channels_last, n_cls_pad=n_cls_pad,
                xy_static=xy, tile_batch=tile_batch)
        return buf

    if channels_last:
        buf = jnp.zeros(tuple(spatial) + (n_cls_pad,), accum_dtype)
        buf = run_chunks(buf, starts, 0)
        return _chunk_argmax(buf, n_cls=n_cls, revert=tuple(revert),
                             channels_last=True, seg_dtype=seg_dtype)

    # z-row streaming (see the layout note above): per-row channels-first
    # buffers with full-minor-dim updates + overlap-add carry between rows
    pz = int(gaussian.shape[-1])
    z_vals = np.unique(starts[:, 2])
    rowbuf = jnp.zeros((n_cls, spatial[0], spatial[1], pz), accum_dtype)
    carry = jnp.zeros_like(rowbuf)
    slabs = []
    for ri, z0 in enumerate(z_vals):
        rowbuf = run_chunks(rowbuf, starts[starts[:, 2] == z0], int(z0),
                            static_xy=True)
        if ri + 1 < len(z_vals):
            d = int(z_vals[ri + 1] - z0)
            seg, carry, rowbuf = _row_finalize(rowbuf, carry, d=d,
                                               seg_dtype=seg_dtype)
        else:
            seg = _row_finalize_last(rowbuf, carry, seg_dtype=seg_dtype)
        slabs.append(seg)
    full = jnp.concatenate(slabs, axis=-1) if len(slabs) > 1 else slabs[0]
    return full[tuple(slice(b, e) for b, e in revert)]
