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

from boa_tpu.ops.pallas_conv import NormAct, identity_normact  # noqa: F401

LANES = 128


def pack_weights_rows(w: np.ndarray, cin_p: int, cout_p: int) -> np.ndarray:
    """(3,3,3, cin, cout) [taps ordered (dz, dx, dy)] → (9, 3·cin_p, cout_p).

    Tap t = dz*3 + dx; the dy taps stack into the K axis in the same
    (dy, ci) order the kernel builds R: K row dy*cin_p + ci.
    """
    cin, cout = w.shape[3], w.shape[4]
    out = np.zeros((9, 3 * cin_p, cout_p), np.float32)
    w = np.asarray(w, np.float32)
    for dz in range(3):
        for dx in range(3):
            t = dz * 3 + dx
            for dy in range(3):
                out[t, dy * cin_p:dy * cin_p + cin, :cout] = w[dz, dx, dy]
    return out


def _rowconv_kernel(norm_ref, w_ref, bias_ref, x_hbm, out_ref, part_ref,
                    r_ref, win_ref, sem, *, bx, cin_p, cout_p, Z, X, Y,
                    slope, out_dtype):
    """One program: bx output x-rows of one z-slice.

    x_hbm is the halo-padded raw input (Z+2, X+2, cin_p, Y). The program
    (zi, xi) DMAs the (3, bx+2, cin_p, Y) window, normalizes + activates,
    builds lane-rolled R rows, and accumulates 9 matmuls per output row.
    """
    z = pl.program_id(0)
    xb = pl.program_id(1)
    nxb = pl.num_programs(1)
    step = z * nxb + xb
    slot = jax.lax.rem(step, 2)
    nslot = jax.lax.rem(step + 1, 2)

    # --- double-buffered window DMA (next block starts before compute)
    @pl.when(step == 0)
    def _():
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(z, 3), pl.ds(xb * bx, bx + 2)],
            win_ref.at[slot], sem.at[slot]).start()

    @pl.when(step + 1 < pl.num_programs(0) * nxb)
    def _():
        nz = (step + 1) // nxb
        nx = jax.lax.rem(step + 1, nxb)
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(nz, 3), pl.ds(nx * bx, bx + 2)],
            win_ref.at[nslot], sem.at[nslot]).start()

    pltpu.make_async_copy(
        x_hbm.at[pl.ds(z, 3), pl.ds(xb * bx, bx + 2)],
        win_ref.at[slot], sem.at[slot]).wait()

    # --- normalize + activate the window, mask halo rows to zero
    xw = win_ref[slot].astype(jnp.float32)            # (3, bx+2, cin_p, Y)
    mean = norm_ref[0, :].reshape(cin_p, 1)
    scale = (norm_ref[1, :] * norm_ref[2, :]).reshape(cin_p, 1)
    beta = norm_ref[3, :].reshape(cin_p, 1)
    xn = (xw - mean) * scale + beta
    if slope != 1.0:
        xn = jnp.where(xn >= 0, xn, xn * slope)
    # halo validity by GLOBAL coords in the padded array: padded z row r is
    # real iff 1 <= z+r-? ... window covers padded rows z..z+2 (output z
    # maps to padded z+1), real input z ∈ [1, Z+1); same for x.
    gz = jax.lax.broadcasted_iota(jnp.int32, xn.shape, 0) + z
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
    def row(xo, _):
        acc = jnp.zeros((cout_p, Y), jnp.float32)
        for dz in range(3):
            for dx in range(3):
                rs = r_ref[dz, xo + dx]             # (3*cin_p, Y)
                acc = acc + jax.lax.dot_general(
                    w_ref[dz * 3 + dx], rs,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        acc = acc + bias_ref[0, :].reshape(cout_p, 1)
        out_ref[0, xo] = acc.astype(out_dtype)
        # x-pad rows (X % bx != 0) are sliced off the output but must not
        # pollute the instance-norm sums
        live = (xb * bx + xo < X).astype(jnp.float32)
        part_ref[0, 0, 0] += live * jnp.sum(acc, axis=1)
        part_ref[0, 0, 1] += live * jnp.sum(acc * acc, axis=1)
        return 0

    part_ref[0, 0, 0] = jnp.zeros((cout_p,), jnp.float32)
    part_ref[0, 0, 1] = jnp.zeros((cout_p,), jnp.float32)
    jax.lax.fori_loop(0, bx, row, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=(
    "slope", "out_dtype", "interpret", "Z", "X", "Y", "cin_p", "cout_p",
    "bx"))
def _rowconv(xp, norm_mat, w_packed, bias, *, slope, out_dtype, interpret,
             Z, X, Y, cin_p, cout_p, bx):
    nxb = pl.cdiv(X, bx)
    pad_x = nxb * bx - X
    if pad_x:
        xp = jnp.pad(xp, ((0, 0), (0, pad_x), (0, 0), (0, 0)))
    kern = functools.partial(
        _rowconv_kernel, bx=bx, cin_p=cin_p, cout_p=cout_p, Z=Z, X=X, Y=Y,
        slope=slope, out_dtype=out_dtype)
    y, partials = pl.pallas_call(
        kern,
        grid=(Z, nxb),
        in_specs=[
            pl.BlockSpec((4, cin_p), lambda z, x: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, 3 * cin_p, cout_p), lambda z, x: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout_p), lambda z, x: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, bx, cout_p, Y), lambda z, x: (z, x, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, cout_p),
                         lambda z, x: (z * pl.num_programs(1) + x, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Z, nxb * bx, cout_p, Y), out_dtype),
            jax.ShapeDtypeStruct((Z * nxb, 1, 2, cout_p), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, bx + 2, 3 * cin_p, Y), jnp.bfloat16),
            pltpu.VMEM((2, 3, bx + 2, cin_p, Y), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(norm_mat, w_packed, bias, xp)
    return y[:, :X], jnp.sum(partials, axis=0)[0]


def conv3d_rows(x: jax.Array, norm: NormAct, w: jax.Array | None,
                b: jax.Array | None, *, slope: float = 1.0,
                out_dtype=jnp.bfloat16, interpret: bool = False,
                w_packed: jax.Array | None = None,
                cin: int | None = None, cout: int | None = None,
                bx: int = 8):
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
            v.astype(jnp.float32))

    norm_mat = jnp.stack([
        _expand(norm.mean, 0.0), _expand(norm.inv_std, 1.0),
        _expand(norm.gamma, 0.0),  # padded channels → xn = 0
        _expand(norm.beta, 0.0)])
    if w_packed is None:
        w_packed = jnp.asarray(
            pack_weights_rows(np.asarray(w, np.float32), cin_p, cout_p),
            jnp.bfloat16)
    bias_c = (b if b is not None else jnp.zeros((cout,), jnp.float32))
    bias_l = jnp.zeros((1, cout_p), jnp.float32).at[0, :cout].set(
        bias_c.astype(jnp.float32))

    y, sums = _rowconv(xp, norm_mat, w_packed, bias_l, slope=slope,
                       out_dtype=out_dtype, interpret=interpret,
                       Z=Z, X=X, Y=Y, cin_p=cin_p, cout_p=cout_p, bx=bx)
    return y[:, :, :cout], sums[:, :cout]
