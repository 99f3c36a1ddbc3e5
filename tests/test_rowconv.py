"""Row-conv Pallas kernel (ops/rowconv.py): parity vs the XLA reference.

Interpret mode on the CPU mesh; the TPU measurement lives in
tools/rowconv_bench.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from boa_tpu.ops import rowconv


def _xla_reference(x_zxcy, norm, w_dzdxdy, b, slope):
    """conv3d(act(IN(x))) on the (Z, X, C, Y) layout via XLA."""
    x = jnp.asarray(x_zxcy, jnp.float32)
    xn = (x - norm.mean.reshape(1, 1, -1, 1)) * (
        norm.inv_std * norm.gamma).reshape(1, 1, -1, 1) \
        + norm.beta.reshape(1, 1, -1, 1)
    if slope != 1.0:
        xn = jnp.where(xn >= 0, xn, xn * slope)
    # the kernel quantizes normalized activations AND weights to bf16
    # before the MXU matmuls (f32 accumulate); mirror that so the
    # comparison isolates the conv math, not the rounding points
    xn = xn.astype(jnp.bfloat16).astype(jnp.float32)
    # to NHWC-ish: (1, Z, X, Y, C)
    v = jnp.transpose(xn, (0, 1, 3, 2))[None]
    k = jnp.asarray(w_dzdxdy, jnp.bfloat16).astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        v, k, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))[0]
    y = y + jnp.asarray(b, jnp.float32)
    return jnp.transpose(y, (0, 1, 3, 2))  # back to (Z, X, C, Y)


@pytest.mark.parametrize("cin,cout,slope,bz,g4", [(32, 32, 0.01, 1, False),
                                                  (8, 16, 1.0, 1, False),
                                                  (8, 8, 0.01, 4, False),
                                                  (32, 32, 0.01, 2, True),
                                                  (8, 16, 1.0, 1, True)])
def test_rowconv_parity(cin, cout, slope, bz, g4, rng):
    Z, X, Y = 6, 16, 128
    x = rng.normal(size=(Z, X, cin, Y)).astype(np.float32) * 2.0 + 0.3
    w = (rng.normal(size=(3, 3, 3, cin, cout)) * 0.2).astype(np.float32)
    b = (rng.normal(size=(cout,)) * 0.1).astype(np.float32)
    norm = rowconv.NormAct(
        mean=jnp.asarray(rng.normal(size=(cin,)), jnp.float32),
        inv_std=jnp.asarray(1.0 + rng.random(cin), jnp.float32),
        gamma=jnp.asarray(1.0 + 0.1 * rng.normal(size=(cin,)), jnp.float32),
        beta=jnp.asarray(0.1 * rng.normal(size=(cin,)), jnp.float32),
        slope=slope)

    # kernel consumes bf16 activations; quantize the reference input the
    # same way so the comparison isolates the kernel math
    xq = np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
    ref = np.asarray(_xla_reference(xq, norm, w, b, slope))

    y, sums = rowconv.conv3d_rows(jnp.asarray(x), norm, jnp.asarray(w),
                                  jnp.asarray(b), slope=slope,
                                  out_dtype=jnp.float32, interpret=True,
                                  bx=8, bz=bz, g4=g4)
    got = np.asarray(y)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
    # stats: Σy / Σy² over the full output
    np.testing.assert_allclose(np.asarray(sums[0]), ref.sum(axis=(0, 1, 3)),
                               rtol=2e-2, atol=2e-1)
    np.testing.assert_allclose(np.asarray(sums[1]),
                               (ref * ref).sum(axis=(0, 1, 3)),
                               rtol=2e-2, atol=2e-1)


def test_stride2_parity(rng):
    """Stride-2 rowconv == torch-convention Conv3d(stride=2, padding=1)
    computed via the dense XLA conv + slicing."""
    Z, X, Y, cin, cout = 8, 16, 128, 8, 16
    x = rng.normal(size=(Z, X, cin, Y)).astype(np.float32)
    w = (rng.normal(size=(3, 3, 3, cin, cout)) * 0.2).astype(np.float32)
    b = (rng.normal(size=(cout,)) * 0.1).astype(np.float32)
    norm = rowconv.NormAct(
        mean=jnp.asarray(rng.normal(size=(cin,)), jnp.float32),
        inv_std=jnp.asarray(1.0 + rng.random(cin), jnp.float32),
        gamma=jnp.asarray(1.0 + 0.1 * rng.normal(size=(cin,)), jnp.float32),
        beta=jnp.asarray(0.1 * rng.normal(size=(cin,)), jnp.float32),
        slope=0.01)
    xq = np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
    dense = np.asarray(_xla_reference(xq, norm, w, b, 0.01))
    ref = dense[::2, ::2, :, ::2]  # out[o] = Σ w[d]·in[2o+d-1] ✓ SAME conv

    y, sums = rowconv.conv3d_rows_stride2(
        jnp.asarray(x), norm, jnp.asarray(w), jnp.asarray(b), slope=0.01,
        out_dtype=jnp.float32, interpret=True, bx2=4)
    got = np.asarray(y)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(sums[0]), ref.sum(axis=(0, 1, 3)),
                               rtol=2e-2, atol=2e-1)


def test_transpconv_parity(rng):
    """2x2x2 stride-2 transposed conv == the scatter definition."""
    Z, X, Y, cin, cout = 6, 10, 64, 16, 8
    x = rng.normal(size=(Z, X, cin, Y)).astype(np.float32)
    w = (rng.normal(size=(2, 2, 2, cin, cout)) * 0.3).astype(np.float32)

    xq = np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
    wq = np.asarray(jnp.asarray(w, jnp.bfloat16), np.float32)
    ref = np.zeros((2 * Z, 2 * X, cout, 2 * Y), np.float32)
    for a in range(2):
        for bb in range(2):
            for p in range(2):
                # out[2z+a, 2x+b, co, 2y+p] = Σ_ci in[z,x,ci,y]·w[a,b,p,ci,co]
                contrib = np.einsum("zxcy,cd->zxdy", xq, wq[a, bb, p])
                ref[a::2, bb::2, :, p::2] = contrib
    y = rowconv.transpconv2_rows(jnp.asarray(x), jnp.asarray(w),
                                 out_dtype=jnp.float32, interpret=True, bx=4)
    got = np.asarray(y)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_unet_rowconv_forward_parity(rng, monkeypatch):
    """BOA_ROWCONV=interpret composite forward == the z-major XLA forward
    (stage 0 + stride-2 boundary + decoder upsample + last decoder stage +
    head all through the Pallas kernels, interior stages shared)."""
    from boa_tpu.models.unet import ArchConfig, init_unet, unet_forward

    cfg = ArchConfig(
        n_stages=3, features_per_stage=(8, 16, 32),
        kernel_sizes=((3, 3, 3),) * 3,
        strides=((1, 1, 1), (2, 2, 2), (2, 2, 2)),
        n_conv_per_stage=(2, 2, 2), n_conv_per_stage_decoder=(2, 2),
        num_classes=5)
    params = init_unet(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray(rng.normal(size=(1, 8, 128, 8, 1)), jnp.float32)

    monkeypatch.delenv("BOA_ROWCONV", raising=False)
    ref = np.asarray(unet_forward(params, x, cfg))
    monkeypatch.setenv("BOA_ROWCONV", "interpret")
    got = np.asarray(unet_forward(params, x, cfg))
    assert got.shape == ref.shape
    # the kernel path quantizes activations/weights to bf16 at the MXU
    # feeds; the XLA reference here runs f32 — compare at bf16 scale
    np.testing.assert_allclose(got, ref, rtol=0.06, atol=0.06)
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.99, f"argmax agreement {agree}"


def test_unet_stride2_kernel_forward_parity(rng, monkeypatch):
    """BOA_STRIDE2_KERNEL=interpret: the stride-2 encoder boundary through
    the Pallas kernel matches the default z-major forward (the one floor
    stage where the kernel BEATS XLA — tools/stride2_bench.py)."""
    from boa_tpu.models.unet import ArchConfig, init_unet, unet_forward

    cfg = ArchConfig(
        n_stages=3, features_per_stage=(8, 16, 32),
        kernel_sizes=((3, 3, 3),) * 3,
        strides=((1, 1, 1), (2, 2, 2), (2, 2, 2)),
        n_conv_per_stage=(2, 2, 2), n_conv_per_stage_decoder=(2, 2),
        num_classes=5)
    params = init_unet(jax.random.PRNGKey(7), cfg)
    x = jnp.asarray(rng.normal(size=(1, 8, 128, 8, 1)), jnp.float32)

    monkeypatch.delenv("BOA_STRIDE2_KERNEL", raising=False)
    ref = np.asarray(unet_forward(params, x, cfg))
    monkeypatch.setenv("BOA_STRIDE2_KERNEL", "interpret")
    got = np.asarray(unet_forward(params, x, cfg))
    assert got.shape == ref.shape
    # kernel quantizes activations/weights to bf16 at the MXU feeds
    np.testing.assert_allclose(got, ref, rtol=0.06, atol=0.06)
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.99, f"argmax agreement {agree}"
    # training path (all_heads) must NOT take the kernel (no custom vjp)
    cfg_ds = ArchConfig(
        n_stages=3, features_per_stage=(8, 16, 32),
        kernel_sizes=((3, 3, 3),) * 3,
        strides=((1, 1, 1), (2, 2, 2), (2, 2, 2)),
        n_conv_per_stage=(2, 2, 2), n_conv_per_stage_decoder=(2, 2),
        num_classes=5, deep_supervision=True)
    outs = unet_forward(params, x, cfg_ds, all_heads=True)
    assert isinstance(outs, list) and len(outs) == 2


def test_unet_rowconv_ineligible_falls_back(rng, monkeypatch):
    """Non-qualifying geometry (Y != 128) silently uses the XLA path."""
    from boa_tpu.models.unet import ArchConfig, init_unet, unet_forward

    cfg = ArchConfig(
        n_stages=2, features_per_stage=(4, 8),
        kernel_sizes=((3, 3, 3),) * 2, strides=((1, 1, 1), (2, 2, 2)),
        n_conv_per_stage=(2, 2), n_conv_per_stage_decoder=(2,),
        num_classes=3)
    params = init_unet(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.normal(size=(1, 8, 16, 8, 1)), jnp.float32)
    monkeypatch.setenv("BOA_ROWCONV", "interpret")
    out = unet_forward(params, x, cfg)
    assert out.shape == (1, 8, 16, 8, 3)


def test_rowconv_x_pad_stats(rng):
    """X not divisible by bx: padded rows are dropped AND excluded from
    the instance-norm sums."""
    Z, X, Y, c = 4, 11, 128, 8
    x = rng.normal(size=(Z, X, c, Y)).astype(np.float32)
    w = (rng.normal(size=(3, 3, 3, c, c)) * 0.2).astype(np.float32)
    b = np.zeros(c, np.float32)
    norm = rowconv.identity_normact(c)
    xq = np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
    ref = np.asarray(_xla_reference(xq, norm, w, b, 1.0))
    y, sums = rowconv.conv3d_rows(jnp.asarray(x), norm, jnp.asarray(w),
                                  jnp.asarray(b), slope=1.0,
                                  out_dtype=jnp.float32, interpret=True,
                                  bx=8)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(sums[0]), ref.sum(axis=(0, 1, 3)),
                               rtol=2e-2, atol=2e-1)
