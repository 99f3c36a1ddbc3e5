"""Row-major fused 3D conv + instance-norm + LeakyReLU Pallas kernel.

Targets the r4 roofline floors (README): XLA runs the flagship's co=32
@128³ conv stages at 54-62 TF/s because its lowering puts OUTPUT CHANNELS
on the 128-wide MXU lane axis — co=32 uses ¼ of the lanes (co=64 stages
measure ~2x, co=128 ~141 TF/s, exactly the lane-fill pattern). The r3
z-packing attempt (`ops/pallas_conv.py`) filled the lanes but made its
group-shift weight matrices 25% block-sparse — 4x wasted FLOPs, 12 TF/s.

This kernel fills the lanes with a SPATIAL axis instead, wasting nothing:

  * layout (Z, X, C, Y): Y on lanes (128 = the flagship patch width), C
    on sublanes (any multiple-of-8 channel count works — sublanes are
    the flexible axis), (Z, X) leading. One (z, x) pair = one "row".
  * im2col by lane rolls: per INPUT row, three lane-rotated copies
    (y-1, y, y+1) stack into R (3C, Y). Each OUTPUT row is then 9
    dense matmuls W(co, 3C) @ R[z+dz, x+dx] (3C, Y) — dy lives in R's
    sublanes, dz/dx are leading-dim window slices (free). K = 3C = 96
    (cin=32) or 192 (cin=64): 75% K-occupancy, zero wasted products.
    R is built once per input row and reused by up to 9 output rows.
  * fused input-side normalize+activation (the previous layer's IN tail,
    same contract as ops/pallas_conv.py): normalized activations never
    touch HBM, and SAME-padding stays correct because the halo rows are
    masked to zero AFTER normalization (torch zero-pads the normalized
    input). Per-channel Σy/Σy² partials come back for the next layer's
    norm — instance-norm statistics cost no extra HBM pass.

Semantics match `models/unet.py` conv_block_apply (torch Conv3d 'same' +
InstanceNorm3d(affine, eps) + LeakyReLU(0.01)); parity-tested against the
XLA path in tests/test_rowconv.py. Reference hot loop this accelerates:
nnunetv2 `predict_from_raw_data.py:602-616` per-tile forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from boa_tpu.ops.pallas_conv import (NormAct, identity_normact,  # noqa: F401
                                     stats_from_sums)

LANES = 128


def pack_weights_rows(w, cin_p: int, cout_p: int):
    """(3,3,3, cin, cout) [taps ordered (dz, dx, dy)] → (9, 3·cin_p, cout_p).

    Tap t = dz*3 + dx; the dy taps stack into the K axis in the same
    (dy, ci) order the kernel builds R: K row dy*cin_p + ci. Accepts a
    numpy array (host path) or a traced jax array (the fold-scan inside
    `unet_forward` passes per-fold weights as tracers)."""
    cin, cout = int(w.shape[3]), int(w.shape[4])
    if isinstance(w, (jax.Array, jax.core.Tracer)):
        wf = w.astype(jnp.float32)
        rows = []
        for dz in range(3):
            for dx in range(3):
                blocks = [jnp.pad(wf[dz, dx, dy],
                                  ((0, cin_p - cin), (0, cout_p - cout)))
                          for dy in range(3)]
                rows.append(jnp.concatenate(blocks, axis=0))
        return jnp.stack(rows)
    out = np.zeros((9, 3 * cin_p, cout_p), np.float32)
    w = np.asarray(w, np.float32)
    for dz in range(3):
        for dx in range(3):
            t = dz * 3 + dx
            for dy in range(3):
                out[t, dy * cin_p:dy * cin_p + cin, :cout] = w[dz, dx, dy]
    return out


def _rowconv_kernel(norm_ref, w_ref, bias_ref, x_hbm, out_ref, part_ref,
                    r_ref, win_ref, sem, *, bz, bx, cin_p, cout_p, Z, X, Y,
                    slope, out_dtype):
    """One program: a (bz, bx) block of output rows.

    x_hbm is the halo-padded raw input (Z+2, X+2, cin_p, Y). The program
    (zb, xb) DMAs the (bz+2, bx+2, cin_p, Y) window, normalizes +
    activates, builds lane-rolled R rows ONCE per window row (z-blocking
    amortizes the roll cost: (bz+2)(bx+2)/(bz·bx) builds per output row
    instead of 3(bx+2)/bx), and accumulates 9 matmuls per output row.
    """
    zb = pl.program_id(0)
    xb = pl.program_id(1)
    nxb = pl.num_programs(1)
    step = zb * nxb + xb
    slot = jax.lax.rem(step, 2)
    nslot = jax.lax.rem(step + 1, 2)

    # --- double-buffered window DMA (next block starts before compute)
    @pl.when(step == 0)
    def _():
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(zb * bz, bz + 2), pl.ds(xb * bx, bx + 2)],
            win_ref.at[slot], sem.at[slot]).start()

    @pl.when(step + 1 < pl.num_programs(0) * nxb)
    def _():
        nz = (step + 1) // nxb
        nx = jax.lax.rem(step + 1, nxb)
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(nz * bz, bz + 2), pl.ds(nx * bx, bx + 2)],
            win_ref.at[nslot], sem.at[nslot]).start()

    pltpu.make_async_copy(
        x_hbm.at[pl.ds(zb * bz, bz + 2), pl.ds(xb * bx, bx + 2)],
        win_ref.at[slot], sem.at[slot]).wait()

    # --- normalize + activate the window, mask halo rows to zero
    xw = win_ref[slot].astype(jnp.float32)        # (bz+2, bx+2, cin_p, Y)
    mean = norm_ref[0, :].reshape(cin_p, 1)
    scale = (norm_ref[1, :] * norm_ref[2, :]).reshape(cin_p, 1)
    beta = norm_ref[3, :].reshape(cin_p, 1)
    xn = (xw - mean) * scale + beta
    if slope is None:  # per-channel slope vector (norm row 4)
        xn = jnp.where(xn >= 0, xn, xn * norm_ref[4, :].reshape(cin_p, 1))
    elif slope != 1.0:
        xn = jnp.where(xn >= 0, xn, xn * slope)
    # halo validity by GLOBAL coords in the padded array: the window covers
    # padded rows zb·bz..zb·bz+bz+1 (output z zo maps to padded zb·bz+zo+1);
    # real input z is in [1, Z+1), same for x.
    gz = jax.lax.broadcasted_iota(jnp.int32, xn.shape, 0) + zb * bz
    gx = jax.lax.broadcasted_iota(jnp.int32, xn.shape, 1) + xb * bx
    valid = ((gz >= 1) & (gz < Z + 1) & (gx >= 1) & (gx < X + 1))
    xn = jnp.where(valid, xn, 0.0)

    # --- lane-rolled R rows: rolls run in f32 (Mosaic needs 32-bit),
    #     stored bf16 for the MXU feeds
    lane = jax.lax.broadcasted_iota(jnp.int32, xn.shape, 3)
    ym = jnp.where(lane >= 1, pltpu.roll(xn, 1, 3), 0.0)       # y-1
    yp = jnp.where(lane < Y - 1, pltpu.roll(xn, Y - 1, 3), 0.0)  # y+1
    r_ref[:, :, 0 * cin_p:1 * cin_p] = ym.astype(jnp.bfloat16)
    r_ref[:, :, 1 * cin_p:2 * cin_p] = xn.astype(jnp.bfloat16)
    r_ref[:, :, 2 * cin_p:3 * cin_p] = yp.astype(jnp.bfloat16)

    # --- 9 matmuls per output row, accumulated in f32 (taps statically
    #     unrolled so Mosaic can software-pipeline the MXU issues)
    def row(i, _):
        zo = i // bx
        xo = jax.lax.rem(i, bx)
        acc = jnp.zeros((cout_p, Y), jnp.float32)
        for dz in range(3):
            for dx in range(3):
                rs = r_ref[zo + dz, xo + dx]        # (3*cin_p, Y)
                acc = acc + jax.lax.dot_general(
                    w_ref[dz * 3 + dx], rs,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        acc = acc + bias_ref[0, :].reshape(cout_p, 1)
        out_ref[zo, xo] = acc.astype(out_dtype)
        # z/x-pad rows (extent % block != 0) are sliced off the output but
        # must not pollute the instance-norm sums
        live = ((xb * bx + xo < X) & (zb * bz + zo < Z)).astype(jnp.float32)
        part_ref[0, 0, 0] += live * jnp.sum(acc, axis=1)
        part_ref[0, 0, 1] += live * jnp.sum(acc * acc, axis=1)
        return 0

    part_ref[0, 0, 0] = jnp.zeros((cout_p,), jnp.float32)
    part_ref[0, 0, 1] = jnp.zeros((cout_p,), jnp.float32)
    jax.lax.fori_loop(0, bz * bx, row, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=(
    "slope", "out_dtype", "interpret", "Z", "X", "Y", "cin_p", "cout_p",
    "bx", "bz", "g4"))
def _rowconv(xp, norm_mat, w_packed, bias, *, slope, out_dtype, interpret,
             Z, X, Y, cin_p, cout_p, bx, bz=1, g4=False):
    nxb = pl.cdiv(X, bx)
    nzb = pl.cdiv(Z, bz)
    pad_x = nxb * bx - X
    pad_z = nzb * bz - Z
    if pad_x or pad_z:
        xp = jnp.pad(xp, ((0, pad_z), (0, pad_x), (0, 0), (0, 0)))
    cp = 4 * cout_p if g4 else cout_p
    kern = functools.partial(
        _rowconv_g4_kernel if g4 else _rowconv_kernel, bz=bz, bx=bx,
        cin_p=cin_p, cout_p=cout_p, Z=Z, X=X, Y=Y, slope=slope,
        out_dtype=out_dtype)
    y, partials = pl.pallas_call(
        kern,
        grid=(nzb, nxb),
        in_specs=[
            pl.BlockSpec((5, cin_p), lambda z, x: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((18, 3 * cin_p, cp) if g4
                         else (9, 3 * cin_p, cp), lambda z, x: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda z, x: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((bz, bx, cout_p, Y), lambda z, x: (z, x, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, cp),
                         lambda z, x: (z * pl.num_programs(1) + x, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nzb * bz, nxb * bx, cout_p, Y), out_dtype),
            jax.ShapeDtypeStruct((nzb * nxb, 1, 2, cp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bz + 2, bx + 2, 3 * cin_p, Y), jnp.bfloat16),
            pltpu.VMEM((2, bz + 2, bx + 2, cin_p, Y), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(norm_mat, w_packed, bias, xp)
    sums = jnp.sum(partials, axis=0)[0]
    if g4:  # fold the 4 packed row-groups' per-channel partials together
        sums = sums.reshape(2, 4, cout_p).sum(axis=1)
    return y[:Z, :X], sums


def conv3d_rows(x: jax.Array, norm: NormAct, w: jax.Array | None,
                b: jax.Array | None, *, slope: float = 1.0,
                out_dtype=jnp.bfloat16, interpret: bool = False,
                w_packed: jax.Array | None = None,
                cin: int | None = None, cout: int | None = None,
                bx: int = 8, bz: int = 1, g4: bool = False):
    """y_raw = conv3d(act(IN(x_raw)), w) + b, plus per-channel (Σy, Σy²).

    x: (Z, X, C, Y) raw activations (`norm` carries x's own IN tail,
    identity for the network input). w: (3, 3, 3, cin, cout), taps
    ordered (dz, dx, dy) to match the layout's spatial order. Returns
    (y (Z, X, cout_p, Y) sliced to cout, sums (2, cout) float32).
    Y must currently be a multiple of 128 lanes worth of real pixels —
    i.e. exactly the lane width (the flagship 128³ tile); other shapes
    take the XLA path.
    """
    Z, X, cin_x, Y = x.shape
    cin = cin if cin is not None else cin_x
    cout = cout if cout is not None else w.shape[-1]
    if Y != LANES:
        raise ValueError(f"rowconv requires Y == {LANES}, got {Y}")
    cin_p = -(-cin // 8) * 8
    cout_p = -(-cout // 8) * 8

    xq = x.astype(jnp.bfloat16)
    if cin_p != cin:
        xq = jnp.pad(xq, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0)))
    # halo pads: one zero z-slab / x-row each side (masked post-norm in
    # the kernel, so the zeros' normalized value never leaks in)
    xp = jnp.pad(xq, ((1, 1), (1, 1), (0, 0), (0, 0)))

    def _expand(v, fill):
        return jnp.full((cin_p,), fill, jnp.float32).at[:cin].set(
            jnp.asarray(v).astype(jnp.float32))

    slope_static = slope if np.isscalar(slope) else None
    slope_row = (_expand(jnp.broadcast_to(jnp.float32(1.0), (cin,)), 1.0)
                 if slope_static is not None else _expand(slope, 1.0))
    norm_mat = jnp.stack([
        _expand(norm.mean, 0.0), _expand(norm.inv_std, 1.0),
        _expand(norm.gamma, 0.0),  # padded channels → xn = 0
        _expand(norm.beta, 0.0), slope_row])
    slope = slope_static
    if g4 and (bx % 4 or 4 * cout_p > 128):
        raise ValueError("g4 rowconv needs bx % 4 == 0 and cout_p <= 32")
    if w_packed is None:
        pack = pack_weights_rows_g4 if g4 else pack_weights_rows
        w_packed = jnp.asarray(pack(w, cin_p, cout_p)).astype(jnp.bfloat16)
    bias_c = (b if b is not None else jnp.zeros((cout,), jnp.float32))
    bias_1 = jnp.zeros((cout_p,), jnp.float32).at[:cout].set(
        bias_c.astype(jnp.float32))
    bias_l = (jnp.tile(bias_1, 4) if g4 else bias_1)[None]

    y, sums = _rowconv(xp, norm_mat, w_packed, bias_l, slope=slope,
                       out_dtype=out_dtype, interpret=interpret,
                       Z=Z, X=X, Y=Y, cin_p=cin_p, cout_p=cout_p, bx=bx,
                       bz=bz, g4=g4)
    return y[:, :, :cout], sums[:, :cout]


# ---------------------------------------------------------------------------
# 4-row-packed variant: the plain kernel's dots are W(3C, co) x R(3C, Y)
# with co = 32 of 128 MXU output rows — a 25% M-occupancy ceiling (49
# TF/s) the measurements hit 37-49% of (18-24 TF/s, tools/rowconv_bench).
# Packing FOUR consecutive x output rows into M = 4*32 = 128 fills the
# output rows at the price of 50% structurally-zero weight blocks: per
# (dz, window-x p) the block W4[p][3C, 4co] holds w[dz, p-j] at column
# group j (zero unless 0 <= p-j < 3). Issued MACs double, but the dots
# become M=128 K=3C N=128 — every MXU dimension full — so the ceiling
# moves to ~98 TF/s. 18 dots per 4-row group vs 36 M=32 dots.
# ---------------------------------------------------------------------------


def pack_weights_rows_g4(w, cin_p: int, cout_p: int):
    """(3,3,3, cin, cout) → (18, 3*cin_p, 4*cout_p): per (dz, p) the
    4-row-packed block (p = window x-position 0..5, j = packed row 0..3,
    dx = p - j)."""
    cin, cout = int(w.shape[3]), int(w.shape[4])
    if isinstance(w, (jax.Array, jax.core.Tracer)):
        wf = w.astype(jnp.float32)
        blocks = []
        for dz in range(3):
            for p in range(6):
                cols = []
                for j in range(4):
                    dx = p - j
                    if 0 <= dx < 3:
                        cols.append(jnp.concatenate(
                            [jnp.pad(wf[dz, dx, dy],
                                     ((0, cin_p - cin), (0, cout_p - cout)))
                             for dy in range(3)], axis=0))
                    else:
                        cols.append(jnp.zeros((3 * cin_p, cout_p),
                                              jnp.float32))
                blocks.append(jnp.concatenate(cols, axis=1))
        return jnp.stack(blocks)
    out = np.zeros((18, 3 * cin_p, 4 * cout_p), np.float32)
    w = np.asarray(w, np.float32)
    for dz in range(3):
        for p in range(6):
            for j in range(4):
                dx = p - j
                if not 0 <= dx < 3:
                    continue
                for dy in range(3):
                    out[dz * 6 + p, dy * cin_p:dy * cin_p + cin,
                        j * cout_p:j * cout_p + cout] = w[dz, dx, dy]
    return out


def _rowconv_g4_kernel(norm_ref, w_ref, bias_ref, x_hbm, out_ref, part_ref,
                       r_ref, win_ref, sem, *, bz, bx, cin_p, cout_p, Z, X,
                       Y, slope, out_dtype):
    """Same contract as _rowconv_kernel; output rows processed in groups
    of 4 via the g4-packed weights (bx % 4 == 0)."""
    zb = pl.program_id(0)
    xb = pl.program_id(1)
    nxb = pl.num_programs(1)
    step = zb * nxb + xb
    slot = jax.lax.rem(step, 2)
    nslot = jax.lax.rem(step + 1, 2)

    @pl.when(step == 0)
    def _():
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(zb * bz, bz + 2), pl.ds(xb * bx, bx + 2)],
            win_ref.at[slot], sem.at[slot]).start()

    @pl.when(step + 1 < pl.num_programs(0) * nxb)
    def _():
        nz = (step + 1) // nxb
        nx = jax.lax.rem(step + 1, nxb)
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(nz * bz, bz + 2), pl.ds(nx * bx, bx + 2)],
            win_ref.at[nslot], sem.at[nslot]).start()

    pltpu.make_async_copy(
        x_hbm.at[pl.ds(zb * bz, bz + 2), pl.ds(xb * bx, bx + 2)],
        win_ref.at[slot], sem.at[slot]).wait()

    xw = win_ref[slot].astype(jnp.float32)        # (bz+2, bx+2, cin_p, Y)
    mean = norm_ref[0, :].reshape(cin_p, 1)
    scale = (norm_ref[1, :] * norm_ref[2, :]).reshape(cin_p, 1)
    beta = norm_ref[3, :].reshape(cin_p, 1)
    xn = (xw - mean) * scale + beta
    if slope is None:
        xn = jnp.where(xn >= 0, xn, xn * norm_ref[4, :].reshape(cin_p, 1))
    elif slope != 1.0:
        xn = jnp.where(xn >= 0, xn, xn * slope)
    gz = jax.lax.broadcasted_iota(jnp.int32, xn.shape, 0) + zb * bz
    gx = jax.lax.broadcasted_iota(jnp.int32, xn.shape, 1) + xb * bx
    valid = ((gz >= 1) & (gz < Z + 1) & (gx >= 1) & (gx < X + 1))
    xn = jnp.where(valid, xn, 0.0)

    lane = jax.lax.broadcasted_iota(jnp.int32, xn.shape, 3)
    ym = jnp.where(lane >= 1, pltpu.roll(xn, 1, 3), 0.0)
    yp = jnp.where(lane < Y - 1, pltpu.roll(xn, Y - 1, 3), 0.0)
    r_ref[:, :, 0 * cin_p:1 * cin_p] = ym.astype(jnp.bfloat16)
    r_ref[:, :, 1 * cin_p:2 * cin_p] = xn.astype(jnp.bfloat16)
    r_ref[:, :, 2 * cin_p:3 * cin_p] = yp.astype(jnp.bfloat16)

    nxg = bx // 4

    def group(i, _):
        zo = i // nxg
        xo = jax.lax.rem(i, nxg) * 4
        acc = jnp.zeros((4 * cout_p, Y), jnp.float32)
        for dz in range(3):
            for p in range(6):
                rs = r_ref[zo + dz, xo + p]          # (3*cin_p, Y)
                acc = acc + jax.lax.dot_general(
                    w_ref[dz * 6 + p], rs,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        acc = acc + bias_ref[0, :].reshape(4 * cout_p, 1)
        for j in range(4):
            aj = acc[j * cout_p:(j + 1) * cout_p]
            out_ref[zo, xo + j] = aj.astype(out_dtype)
            live = ((xb * bx + xo + j < X)
                    & (zb * bz + zo < Z)).astype(jnp.float32)
            part_ref[0, 0, 0, j * cout_p:(j + 1) * cout_p] += \
                live * jnp.sum(aj, axis=1)
            part_ref[0, 0, 1, j * cout_p:(j + 1) * cout_p] += \
                live * jnp.sum(aj * aj, axis=1)
        return 0

    part_ref[0, 0, 0] = jnp.zeros((4 * cout_p,), jnp.float32)
    part_ref[0, 0, 1] = jnp.zeros((4 * cout_p,), jnp.float32)
    jax.lax.fori_loop(0, bz * nxg, group, 0, unroll=True)


# ---------------------------------------------------------------------------
# Stride-2 down-conv: the enc*.conv1 roofline floor (XLA computes the DENSE
# conv and discards 7/8 of it — 13 TF/s measured). Reads the rowconv layout,
# deinterleaves y by exact 0/1 selection MATMULS (S_dy[y, yo] = δ(y =
# 2yo+dy-1) — a stride-2 lane gather would be a relayout; on the MXU it is
# free throughput), computes only the needed outputs, and emits
# (Z/2, X/2, cout_p, Y/2); the consumer's (C, Y) → (Y, C) flip is a cheap
# XLA transpose at the 8x-smaller output scale.
# ---------------------------------------------------------------------------


def _stride2_kernel(norm_ref, w_ref, s_ref, bias_ref, x_hbm, out_ref,
                    part_ref, r_ref, win_ref, sem, *, bx2, cin_p, cout_p,
                    Z, X, Y, slope, out_dtype):
    z2 = pl.program_id(0)
    xb = pl.program_id(1)
    nxb = pl.num_programs(1)
    step = z2 * nxb + xb
    slot = jax.lax.rem(step, 2)
    nslot = jax.lax.rem(step + 1, 2)
    wx = 2 * bx2 + 1  # input x rows feeding bx2 stride-2 output rows

    @pl.when(step == 0)
    def _():
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(2 * z2, 3), pl.ds(xb * 2 * bx2, wx)],
            win_ref.at[slot], sem.at[slot]).start()

    @pl.when(step + 1 < pl.num_programs(0) * nxb)
    def _():
        nz = (step + 1) // nxb
        nx = jax.lax.rem(step + 1, nxb)
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(2 * nz, 3), pl.ds(nx * 2 * bx2, wx)],
            win_ref.at[nslot], sem.at[nslot]).start()

    pltpu.make_async_copy(
        x_hbm.at[pl.ds(2 * z2, 3), pl.ds(xb * 2 * bx2, wx)],
        win_ref.at[slot], sem.at[slot]).wait()

    xw = win_ref[slot].astype(jnp.float32)          # (3, wx, cin_p, Y)
    mean = norm_ref[0, :].reshape(cin_p, 1)
    scale = (norm_ref[1, :] * norm_ref[2, :]).reshape(cin_p, 1)
    beta = norm_ref[3, :].reshape(cin_p, 1)
    xn = (xw - mean) * scale + beta
    if slope is None:  # per-channel slope vector (norm row 4)
        xn = jnp.where(xn >= 0, xn, xn * norm_ref[4, :].reshape(cin_p, 1))
    elif slope != 1.0:
        xn = jnp.where(xn >= 0, xn, xn * slope)
    gz = jax.lax.broadcasted_iota(jnp.int32, xn.shape, 0) + 2 * z2
    gx = jax.lax.broadcasted_iota(jnp.int32, xn.shape, 1) + xb * 2 * bx2
    valid = ((gz >= 1) & (gz < Z + 1) & (gx >= 1) & (gx < X + 1))
    xn = jnp.where(valid, xn, 0.0).astype(jnp.bfloat16)

    # R2 rows: y-deinterleaved taps, (3, wx, 3*cin_p, 128). The S matrices
    # are zero beyond column Y//2, so lanes Y//2.. stay zero — the lane
    # dim is kept at 128 because HBM minor dims must be 128-aligned for
    # the output DMA (partial-lane DMA of lane-padded arrays is
    # unsupported; the caller slices y[..., :Y//2] outside the kernel)
    for dy in range(3):
        r_ref[:, :, dy * cin_p:(dy + 1) * cin_p] = jax.lax.dot_general(
            xn, s_ref[dy],
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def row(xo, _):
        acc = jnp.zeros((cout_p, LANES), jnp.float32)
        for dz in range(3):
            for dx in range(3):
                rs = r_ref[dz, 2 * xo + dx]
                acc = acc + jax.lax.dot_general(
                    w_ref[dz * 3 + dx], rs,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        # bias only on live lanes (< Y//2): dead lanes must stay zero or
        # they'd pollute the Σ/Σ² stats
        lane = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
        acc = jnp.where(lane < Y // 2,
                        acc + bias_ref[0, :].reshape(cout_p, 1), 0.0)
        out_ref[0, xo] = acc.astype(out_dtype)
        live = (xb * bx2 + xo < X // 2).astype(jnp.float32)
        part_ref[0, 0, 0] += live * jnp.sum(acc, axis=1)
        part_ref[0, 0, 1] += live * jnp.sum(acc * acc, axis=1)
        return 0

    part_ref[0, 0, 0] = jnp.zeros((cout_p,), jnp.float32)
    part_ref[0, 0, 1] = jnp.zeros((cout_p,), jnp.float32)
    jax.lax.fori_loop(0, bx2, row, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=(
    "slope", "out_dtype", "interpret", "Z", "X", "Y", "cin_p", "cout_p",
    "bx2"))
def _stride2(xp, norm_mat, w_packed, s_mats, bias, *, slope, out_dtype,
             interpret, Z, X, Y, cin_p, cout_p, bx2):
    Z2, X2, Y2 = Z // 2, X // 2, Y // 2
    nxb = pl.cdiv(X2, bx2)
    pad_x = nxb * bx2 * 2 - X
    if pad_x:
        xp = jnp.pad(xp, ((0, 0), (0, pad_x), (0, 0), (0, 0)))
    kern = functools.partial(
        _stride2_kernel, bx2=bx2, cin_p=cin_p, cout_p=cout_p, Z=Z, X=X,
        Y=Y, slope=slope, out_dtype=out_dtype)
    wx = 2 * bx2 + 1
    y, partials = pl.pallas_call(
        kern,
        grid=(Z2, nxb),
        in_specs=[
            pl.BlockSpec((5, cin_p), lambda z, x: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, 3 * cin_p, cout_p), lambda z, x: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Y, LANES), lambda z, x: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout_p), lambda z, x: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, bx2, cout_p, LANES), lambda z, x: (z, x, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, cout_p),
                         lambda z, x: (z * pl.num_programs(1) + x, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # lane dim stays 128 (HBM minors must be 128-aligned for the
            # block DMA); live data is lanes [0, Y2) — sliced by the caller
            jax.ShapeDtypeStruct((Z2, nxb * bx2, cout_p, LANES), out_dtype),
            jax.ShapeDtypeStruct((Z2 * nxb, 1, 2, cout_p), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, wx, 3 * cin_p, LANES), jnp.bfloat16),
            pltpu.VMEM((2, 3, wx, cin_p, Y), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(norm_mat, w_packed, s_mats, bias, xp)
    return y[:, :X2, :, :Y2], jnp.sum(partials, axis=0)[0]


def conv3d_rows_stride2(x: jax.Array, norm: NormAct, w: jax.Array,
                        b: jax.Array | None, *, slope: float = 1.0,
                        out_dtype=jnp.bfloat16, interpret: bool = False,
                        bx2: int = 8):
    """Stride-2 'same' conv on the rowconv layout: (Z, X, C, Y) →
    (Z/2, X/2, cout_p, Y/2) + (2, cout) sums. Even extents required.
    Output center convention matches torch Conv3d(stride=2, padding=1):
    out[o] = Σ_d w[d]·in[2o+d-1]."""
    Z, X, cin, Y = x.shape
    cout = w.shape[-1]
    if Y != LANES or Z % 2 or X % 2 or Y % 2:
        raise ValueError(f"stride-2 rowconv needs Y == {LANES}, even dims")
    cin_p = -(-cin // 8) * 8
    cout_p = -(-cout // 8) * 8
    xq = x.astype(jnp.bfloat16)
    if cin_p != cin:
        xq = jnp.pad(xq, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0)))
    xp = jnp.pad(xq, ((1, 1), (1, 1), (0, 0), (0, 0)))

    def _expand(v, fill):
        return jnp.full((cin_p,), fill, jnp.float32).at[:cin].set(
            jnp.asarray(v).astype(jnp.float32))

    slope_static = slope if np.isscalar(slope) else None
    slope_row = (_expand(jnp.broadcast_to(jnp.float32(1.0), (cin,)), 1.0)
                 if slope_static is not None else _expand(slope, 1.0))
    norm_mat = jnp.stack([
        _expand(norm.mean, 0.0), _expand(norm.inv_std, 1.0),
        _expand(norm.gamma, 0.0), _expand(norm.beta, 0.0), slope_row])
    slope = slope_static
    w_packed = jnp.asarray(
        pack_weights_rows(w, cin_p, cout_p)).astype(jnp.bfloat16)
    # S_dy[y, yo] = δ(y == 2*yo + dy - 1): exact 0/1 deinterleave matrices.
    # Columns padded to 128 lanes (zeros) so every VMEM/HBM minor dim in
    # the kernel stays lane-aligned — see the out_shape note in _stride2.
    s = np.zeros((3, Y, LANES), np.float32)
    for dy in range(3):
        for yo in range(Y // 2):
            yi = 2 * yo + dy - 1
            if 0 <= yi < Y:
                s[dy, yi, yo] = 1.0
    s_mats = jnp.asarray(s, jnp.bfloat16)
    bias_c = (b if b is not None else jnp.zeros((cout,), jnp.float32))
    bias_l = jnp.zeros((1, cout_p), jnp.float32).at[0, :cout].set(
        bias_c.astype(jnp.float32))
    y, sums = _stride2(xp, norm_mat, w_packed, s_mats, bias_l, slope=slope,
                       out_dtype=out_dtype, interpret=interpret, Z=Z, X=X,
                       Y=Y, cin_p=cin_p, cout_p=cout_p, bx2=bx2)
    return y[:, :, :cout], sums[:, :cout]


# ---------------------------------------------------------------------------
# 2x2x2 stride-2 transposed conv (decoder upsample): each output voxel
# receives exactly ONE tap, so the op is 8 per-parity matmuls plus a y
# interleave — which XLA lowers as a relayout chain (1.9 ms for 2.2 GFLOP,
# r4 roofline). Here the interleave is an exact 0/1 matmul E_p[y, yout] =
# δ(yout = 2y+p). Input is the (Z, X, C, Y) layout (one cheap XLA
# transpose of the 8x-smaller 64³ activation), output is rowconv layout
# at 2x resolution — ready for the dec4 rowconv stages.
# ---------------------------------------------------------------------------


def _transp_kernel(w_ref, e_ref, x_hbm, out_ref, r_ref, win_ref, sem, *,
                   bx, cin_p, cout_p, Y, out_dtype):
    z = pl.program_id(0)
    xb = pl.program_id(1)
    nxb = pl.num_programs(1)
    step = z * nxb + xb
    slot = jax.lax.rem(step, 2)
    nslot = jax.lax.rem(step + 1, 2)

    @pl.when(step == 0)
    def _():
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(z, 1), pl.ds(xb * bx, bx)],
            win_ref.at[slot], sem.at[slot]).start()

    @pl.when(step + 1 < pl.num_programs(0) * nxb)
    def _():
        nz = (step + 1) // nxb
        nx = jax.lax.rem(step + 1, nxb)
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(nz, 1), pl.ds(nx * bx, bx)],
            win_ref.at[nslot], sem.at[nslot]).start()

    pltpu.make_async_copy(
        x_hbm.at[pl.ds(z, 1), pl.ds(xb * bx, bx)],
        win_ref.at[slot], sem.at[slot]).wait()

    # R rows: y-interleaved input, (bx, 2*cin_p, 2Y):
    # rows [p*cin_p + ci], cols yout — R[p·cin+ci, yout] = in[ci, y]·δ(yout=2y+p).
    # The window's lane dim is 128 (input zero-padded beyond Y: HBM minors
    # must be 128-aligned for the DMA); E's rows ≥ Y are zero, so the pad
    # lanes contribute nothing to the contraction.
    xw = win_ref[slot][0].astype(jnp.bfloat16)      # (bx, cin_p, 128)
    for p in range(2):
        r_ref[:, p * cin_p:(p + 1) * cin_p] = jax.lax.dot_general(
            xw, e_ref[p],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def row(xo, _):
        rs = r_ref[xo]                               # (2*cin_p, 2Y)
        for a in range(2):
            for bb in range(2):
                out_ref[a, 2 * xo + bb] = jax.lax.dot_general(
                    w_ref[a * 2 + bb], rs,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(out_dtype)
        return 0

    jax.lax.fori_loop(0, bx, row, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=(
    "out_dtype", "interpret", "Z", "X", "Y", "cin_p", "cout_p", "bx"))
def _transp(xt, w_packed, e_mats, *, out_dtype, interpret, Z, X, Y,
            cin_p, cout_p, bx):
    nxb = pl.cdiv(X, bx)
    pad_x = nxb * bx - X
    if pad_x:
        xt = jnp.pad(xt, ((0, 0), (0, pad_x), (0, 0), (0, 0)))
    kern = functools.partial(_transp_kernel, bx=bx, cin_p=cin_p,
                             cout_p=cout_p, Y=Y, out_dtype=out_dtype)
    y = pl.pallas_call(
        kern,
        grid=(Z, nxb),
        in_specs=[
            pl.BlockSpec((4, 2 * cin_p, cout_p), lambda z, x: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, LANES, 2 * Y), lambda z, x: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((2, 2 * bx, cout_p, 2 * Y),
                               lambda z, x: (z, x, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * Z, 2 * nxb * bx, cout_p, 2 * Y),
                                       out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bx, 2 * cin_p, 2 * Y), jnp.bfloat16),
            pltpu.VMEM((2, 1, bx, cin_p, LANES), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(w_packed, e_mats, xt)
    return y[:, :2 * X]


def transpconv2_rows(x: jax.Array, w: jax.Array, *,
                     out_dtype=jnp.bfloat16, interpret: bool = False,
                     bx: int = 8):
    """2x2x2 stride-2 transposed conv: (Z, X, C, Y) → (2Z, 2X, cout_p, 2Y).

    w: (2, 2, 2, cin, cout) with taps (a=z, b=x, p=y):
    out[2z+a, 2x+b, co, 2y+p] = Σ_ci x[z, x, ci, y] · w[a, b, p, ci, co].
    2Y must equal 128 lanes (i.e. the 64³ → 128³ decoder upsample)."""
    Z, X, cin, Y = x.shape
    cout = w.shape[-1]
    if 2 * Y != LANES:
        raise ValueError(f"transpconv2_rows needs 2*Y == {LANES}")
    cin_p = -(-cin // 8) * 8
    cout_p = -(-cout // 8) * 8
    xq = x.astype(jnp.bfloat16)
    if cin_p != cin:
        xq = jnp.pad(xq, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0)))
    # lane-pad the input to 128: its HBM minor dim must be 128-aligned
    # for the window DMA (partial-lane DMA of lane-padded arrays is
    # unsupported on Mosaic — found when the composite forward first
    # compiled on real TPU; interpret mode does not enforce tiling)
    xq = jnp.pad(xq, ((0, 0), (0, 0), (0, 0), (0, LANES - Y)))
    # weights: (a, b) → (2·cin_p, cout_p) with rows (p·cin_p + ci)
    if isinstance(w, (jax.Array, jax.core.Tracer)):
        wf = w.astype(jnp.float32)
        wp = jnp.stack([
            jnp.concatenate([
                jnp.pad(wf[a, bb, p], ((0, cin_p - cin), (0, cout_p - cout)))
                for p in range(2)], axis=0)
            for a in range(2) for bb in range(2)])
    else:
        wp = np.zeros((4, 2 * cin_p, cout_p), np.float32)
        wn = np.asarray(w, np.float32)
        for a in range(2):
            for bb in range(2):
                for p in range(2):
                    wp[a * 2 + bb, p * cin_p:p * cin_p + cin, :cout] = \
                        wn[a, bb, p]
    # interleave operators with 128 rows (rows ≥ Y zero — the input's
    # lane padding, see above)
    e = np.zeros((2, LANES, 2 * Y), np.float32)
    for p in range(2):
        for y in range(Y):
            e[p, y, 2 * y + p] = 1.0
    y = _transp(xq, jnp.asarray(wp, jnp.bfloat16), jnp.asarray(e, jnp.bfloat16),
                out_dtype=out_dtype, interpret=interpret, Z=Z, X=X, Y=Y,
                cin_p=cin_p, cout_p=cout_p, bx=bx)
    return y[:, :, :cout]
