"""Fused 3D conv + instance-norm + LeakyReLU Pallas TPU kernels.

Why: XLA's Conv3D on (X,Y,Z,C) volumes with C ≤ 64 runs at <10% MXU (the
lane axis is the channel axis) and instance norm breaks producer fusion,
so the reference hot loop (`predict_from_raw_data.py:602-616` per-tile
forward) is memory bound: 26.5 GB of HBM traffic for a 1.05 TFLOP patch
forward (measured on v5e).

Kernel design (see /opt/skills/guides/pallas_guide.md):

* **z-packed lanes.** Activations are stored as (X, Y, Z/p, p·C): p
  consecutive z-slices share the 128-wide lane dim, so small-channel
  stages (C=32 → p=4) fill the MXU/VPU lanes completely, and the HBM
  memref's minor dim is 128-aligned (Mosaic cannot DMA partial-lane
  slices). The repack is a layout-preserving reshape — free.
* **dz folded into weights.** The conv's 3 z-taps become 3 *group-shift*
  matrices W_g (p·C_in, p·C_out) built on the host: output z-position ↔
  input z-position products live inside the matrix, so the kernel never
  needs cross-lane shifts — just 27 (dx, dy, g) MXU matmuls with K = p·C_in
  ≥ 128 against sublane-shifted windows.
* **fused input normalize + LeakyReLU.** The *previous* layer's instance
  norm (precomputed mean/var) and activation are applied to the VMEM
  window on the fly; normalized activations never touch HBM.
* **free statistics.** Each block emits per-lane Σy and Σy²; reduced
  outside into the mean/var the *next* layer's fused normalize needs —
  instance-norm stats cost no extra pass over HBM.

Semantics match `models/unet.py` conv_block_apply (torch Conv3d 'same' +
InstanceNorm3d(affine, eps) + LeakyReLU(0.01)); parity-tested against the
XLA path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


class NormAct(NamedTuple):
    """Input-side normalization+activation (the previous layer's IN tail)."""

    mean: jax.Array     # (C,)
    inv_std: jax.Array  # (C,) = 1/sqrt(var+eps)
    gamma: jax.Array    # (C,) affine scale (ones if not affine)
    beta: jax.Array     # (C,) affine bias
    slope: float        # LeakyReLU negative slope; 1.0 = no activation


def identity_normact(c: int, dtype=jnp.float32) -> NormAct:
    return NormAct(jnp.zeros(c, dtype), jnp.ones(c, dtype),
                   jnp.ones(c, dtype), jnp.zeros(c, dtype), 1.0)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def plan_packing(cin: int, cout: int) -> tuple[int, int, int]:
    """(p, cin_p, cout_p): z-pack factor + padded channel counts such that
    p·cin_p and p·cout_p are multiples of LANES."""
    cout_pow2 = 2 ** max(0, cout - 1).bit_length() if cout > 1 else 1
    p = max(1, LANES // min(cout_pow2, LANES))
    cin_p = _round_up(p * cin, LANES) // p
    cout_p = _round_up(p * cout, LANES) // p
    return p, cin_p, cout_p


def pack_weights(w: np.ndarray, p: int, cin_p: int, cout_p: int) -> np.ndarray:
    """(3,3,3,cin,cout) → (27, p·cin_p, p·cout_p) group-shift matrices.

    Tap order: (dx, dy, g) with g ∈ {-1, 0, +1} the input z-GROUP shift.
    y[zg·p+zo] sums x[(zg+g)·p+zi]·W[dz] where zi = zo + dz − g·p.
    """
    cin, cout = w.shape[3], w.shape[4]
    out = np.zeros((27, p * cin_p, p * cout_p), np.float32)
    w = np.asarray(w, np.float32)
    for dx in range(3):
        for dy in range(3):
            for tg, g in enumerate((-1, 0, 1)):
                t = (dx * 3 + dy) * 3 + tg
                for zo in range(p):
                    for dz in (-1, 0, 1):
                        zi = zo + dz - g * p
                        if 0 <= zi < p:
                            out[t,
                                zi * cin_p:zi * cin_p + cin,
                                zo * cout_p:zo * cout_p + cout] = \
                                w[dx, dy, dz + 1]
    return out


def _conv_kernel(norm_ref, w_ref, bias_ref, x_hbm, out_ref, part_ref,
                 win_ref, rolled_ref, sem, *, bx, by, zg, p, lin, lout,
                 slope, out_dtype, X, Y, Z, window_g):
    """One output block: DMA window → normalize/act → 27 shifted matmuls.

    The window DMA is double-buffered across grid steps (start the next
    block's transfer before computing on the current one) so HBM reads
    overlap the MXU work — with a single in-kernel DMA the transfer
    latency dominated (measured ~6.5 ms for a 128² grid, compute-free).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    nby = pl.num_programs(1)
    step = i * nby + j
    slot = jax.lax.rem(step, 2)
    nslot = jax.lax.rem(step + 1, 2)

    # 1. double-buffered DMA of the (bx+2, by+2, window_g, p·cin_p) window
    @pl.when(step == 0)
    def _():
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * bx, bx + 2), pl.ds(j * by, by + 2)],
            win_ref.at[slot], sem.at[slot]).start()

    @pl.when(step + 1 < pl.num_programs(0) * nby)
    def _():
        ni = (step + 1) // nby
        nj = jax.lax.rem(step + 1, nby)
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(ni * bx, bx + 2), pl.ds(nj * by, by + 2)],
            win_ref.at[nslot], sem.at[nslot]).start()

    pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * bx, bx + 2), pl.ds(j * by, by + 2)],
        win_ref.at[slot], sem.at[slot]).wait()

    # 2. fused input normalize + LeakyReLU. SAME-padding / overhang voxels
    #    must be 0 AFTER normalization (torch zero-pads the *normalized*
    #    input), so mask by global (x, y, z); z is decoded from (sublane
    #    group, lane) since lanes hold (z_in_group, channel).
    xw = win_ref[slot].astype(jnp.float32)
    shp = xw.shape
    xn = (xw - norm_ref[0, :]) * (norm_ref[1, :] * norm_ref[2, :]) \
        + norm_ref[3, :]
    if slope != 1.0:
        xn = jnp.where(xn >= 0, xn, xn * slope)
    gx = jax.lax.broadcasted_iota(jnp.int32, shp, 0) + i * bx
    gy = jax.lax.broadcasted_iota(jnp.int32, shp, 1) + j * by
    zgrp = jax.lax.broadcasted_iota(jnp.int32, shp, 2)
    zlane = jax.lax.broadcasted_iota(jnp.int32, shp, 3) // (lin // p)
    gz = (zgrp - 1) * p + zlane  # window group 0 is the z halo group
    valid = ((gx >= 1) & (gx < X + 1) & (gy >= 1) & (gy < Y + 1)
             & (gz >= 0) & (gz < Z))
    xn = jnp.where(valid, xn, 0.0)  # f32: Mosaic rotate needs 32-bit

    # 3. 27 (dx, dy, g) matmuls, K = p·cin_p, accumulated in f32.
    #    The z-group shift uses pltpu.roll (native sublane rotate) + an
    #    offset-0 slice, and dx/dy slices touch only untiled leading dims,
    #    so no value relayouts are needed; dot_general batches over the
    #    leading (x, y) dims directly.
    wg = xn.shape[2]
    rolled_ref[0] = xn[:, :, 0:zg, :].astype(jnp.bfloat16)
    rolled_ref[1] = pltpu.roll(xn, wg - 1, 2)[:, :, 0:zg, :].astype(
        jnp.bfloat16)
    rolled_ref[2] = pltpu.roll(xn, wg - 2, 2)[:, :, 0:zg, :].astype(
        jnp.bfloat16)

    def tap(t, acc):
        dx = t // 9
        dy = jax.lax.rem(t // 3, 3)
        g = jax.lax.rem(t, 3)
        xs = rolled_ref[g, pl.ds(dx, bx), pl.ds(dy, by)]
        return acc + jax.lax.dot_general(
            xs, w_ref[t],
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, 27, tap,
                            jnp.zeros((bx, by, zg, lout), jnp.float32))
    acc = acc + bias_ref[0, :]

    # 4. write output block + per-lane stats partials (overhang excluded)
    out_ref[:] = acc.astype(out_dtype)
    shp_o = (bx, by, zg, lout)
    ox = jax.lax.broadcasted_iota(jnp.int32, shp_o, 0) + i * bx
    oy = jax.lax.broadcasted_iota(jnp.int32, shp_o, 1) + j * by
    ozg = jax.lax.broadcasted_iota(jnp.int32, shp_o, 2)
    ozl = jax.lax.broadcasted_iota(jnp.int32, shp_o, 3) // (lout // p)
    oz = ozg * p + ozl
    valid_o = (ox < X) & (oy < Y) & (oz < Z)
    accm = jnp.where(valid_o, acc, 0.0)
    part_ref[0, 0] = jnp.sum(accm, axis=(0, 1, 2))
    part_ref[0, 1] = jnp.sum(accm * accm, axis=(0, 1, 2))


def _pick_block(X: int, Y: int, zg: int, lin: int, lout: int,
                vmem_budget: int = 10 * 1024 * 1024) -> tuple[int, int]:
    bx, by = min(X, 8), min(Y, 16)

    def need(bx, by):
        s = bx * by * zg
        return (2 * (bx + 2) * (by + 2) * (zg + 8) * lin * 2  # 2 windows
                + 3 * (bx + 2) * (by + 2) * zg * lin * 2      # rolled views
                + 2 * s * lout * 4                            # acc + epilogue
                + 2 * s * lout * 2                            # out blocks
                + 27 * lin * lout * 2)                        # weights

    while need(bx, by) > vmem_budget and by > 1:
        by = max(1, by // 2)
    while need(bx, by) > vmem_budget and bx > 1:
        bx = max(1, bx // 2)
    return bx, by


@functools.partial(jax.jit, static_argnames=(
    "slope", "out_dtype", "interpret", "X", "Y", "Z", "p", "cin_p",
    "cout_p"))
def _conv_packed(xpk, norm_mat, w_packed, bias, *, slope, out_dtype,
                 interpret, X, Y, Z, p, cin_p, cout_p):
    lin, lout = p * cin_p, p * cout_p
    # caller built the window as round_up(zg_out + 2, 8) = zg_out + 8 with
    # zg_out itself 8-aligned, so the output group count is window - 8
    zg = xpk.shape[2] - 8
    bx, by = _pick_block(X, Y, zg, lin, lout)
    nbx, nby = pl.cdiv(X, bx), pl.cdiv(Y, by)
    pad_x = nbx * bx - X
    pad_y = nby * by - Y
    xpk = jnp.pad(xpk, ((1, 1 + pad_x), (1, 1 + pad_y), (0, 0), (0, 0)))

    window_g = xpk.shape[2]
    kern = functools.partial(_conv_kernel, bx=bx, by=by, zg=zg, p=p,
                             lin=lin, lout=lout, slope=slope,
                             out_dtype=out_dtype, X=X, Y=Y, Z=Z,
                             window_g=window_g)
    y, partials = pl.pallas_call(
        kern,
        grid=(nbx, nby),
        in_specs=[
            pl.BlockSpec((4, lin), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27, lin, lout), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((bx, by, zg, lout), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, lout),
                         lambda i, j: (i * pl.num_programs(1) + j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nbx * bx, nby * by, zg, lout), out_dtype),
            jax.ShapeDtypeStruct((nbx * nby, 2, lout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, bx + 2, by + 2, window_g, lin), jnp.bfloat16),
            pltpu.VMEM((3, bx + 2, by + 2, zg, lin), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(norm_mat, w_packed, bias, xpk)
    return y[:X, :Y], jnp.sum(partials, axis=0)


def conv3d_in_act(x: jax.Array, norm: NormAct, w: jax.Array | None,
                  b: jax.Array | None, *, slope: float = 1.0,
                  out_dtype=jnp.bfloat16, interpret: bool = False,
                  w_packed: jax.Array | None = None,
                  cin: int | None = None, cout: int | None = None):
    """y_raw = conv3d(act(IN(x_raw)), w) + b, plus per-channel (Σy, Σy²).

    x: (X, Y, Z, Cin) raw (un-normalized) activations; `norm` carries the
    stats/affine of x's own instance norm (identity for the network
    input). w: (3, 3, 3, Cin, Cout); b: (Cout,) or None. Returns
    (y (X, Y, Z, Cout) out_dtype, sums (2, Cout) float32 = [Σy, Σy²]).
    Pass `w_packed` (from `pack_weights`) plus cin/cout to skip the
    per-call host packing.
    """
    X, Y, Z, cin_x = x.shape
    cin = cin if cin is not None else cin_x
    cout = cout if cout is not None else w.shape[-1]
    p, cin_p, cout_p = plan_packing(cin, cout)
    lin = p * cin_p

    zp = _round_up(Z, p)
    xq = x.astype(jnp.bfloat16)
    if cin_p != cin or zp != Z:
        xq = jnp.pad(xq, ((0, 0), (0, 0), (0, zp - Z), (0, cin_p - cin)))
    # layout-preserving z-pack + one halo group of zeros each side.
    # Mosaic DMA/block shapes on the sublane dim must be 8-aligned, so the
    # output group count is rounded to 8 and the haloed window to 8 too.
    zg_real = zp // p
    zg_out = _round_up(zg_real, 8)
    window_g = _round_up(zg_out + 2, 8)
    xpk = xq.reshape(X, Y, zg_real, lin)
    xpk = jnp.pad(xpk, ((0, 0), (0, 0), (1, window_g - zg_real - 1), (0, 0)))

    def _expand(v, fill):
        vp = jnp.full((cin_p,), fill, jnp.float32).at[:cin].set(
            v.astype(jnp.float32))
        return jnp.tile(vp, p)

    norm_mat = jnp.stack([
        _expand(norm.mean, 0.0), _expand(norm.inv_std, 1.0),
        _expand(norm.gamma, 0.0),  # padded channels → xn = 0
        _expand(norm.beta, 0.0)])
    if w_packed is None:
        w_packed = jnp.asarray(pack_weights(np.asarray(w, np.float32),
                                            p, cin_p, cout_p), jnp.bfloat16)
    bias_c = (b if b is not None else jnp.zeros((cout,), jnp.float32))
    bias_l = jnp.tile(jnp.zeros((cout_p,), jnp.float32).at[:cout].set(
        bias_c.astype(jnp.float32)), p).reshape(1, p * cout_p)

    y, sums = _conv_packed(xpk, norm_mat, w_packed, bias_l, slope=slope,
                           out_dtype=out_dtype, interpret=interpret,
                           X=X, Y=Y, Z=Z, p=p, cin_p=cin_p, cout_p=cout_p)
    # unpack: (X, Y, zg_out, p·cout_p) → (X, Y, Z, cout)
    y = y[:, :, :zg_real].reshape(X, Y, zg_real * p, cout_p)[:, :, :Z, :cout]
    # lane sums → channel sums (fold the p z-groups)
    sums = sums.reshape(2, p, cout_p)[:, :, :cout].sum(axis=1)
    return y, sums


def stats_from_sums(sums: jax.Array, count: int, eps: float = 1e-5):
    """(mean, inv_std) from (2, C) [Σy, Σy²] over `count` voxels."""
    mean = sums[0] / count
    var = jnp.maximum(sums[1] / count - mean * mean, 0.0)
    return mean, jax.lax.rsqrt(var + eps)
