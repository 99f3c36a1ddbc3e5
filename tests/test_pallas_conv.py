"""Fused Pallas conv kernel: parity vs XLA conv + instance-norm semantics.

Runs in Pallas interpret mode on the CPU suite; the same kernel compiles
for TPU (validated on v5e: matches XLA to bf16 tolerance, ~12 TF/s useful
on the 128³/c32 stage vs ~10 TF/s for XLA's conv+IN+LReLU chain)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boa_tpu.ops.pallas_conv import (NormAct, conv3d_in_act,
                                     identity_normact, pack_weights,
                                     plan_packing, stats_from_sums)


def _xla_conv(x, w, b=None):
    dn = ("NDHWC", "DHWIO", "NDHWC")
    y = jax.lax.conv_general_dilated(x[None], w, (1, 1, 1), [(1, 1)] * 3,
                                     dimension_numbers=dn)[0]
    return y + b if b is not None else y


@pytest.mark.parametrize("shape,cin,cout", [
    ((12, 10, 16), 8, 16),    # p=8 packing
    ((16, 12, 16), 32, 32),   # p=4
    ((8, 8, 8), 64, 64),      # p=2
    ((6, 6, 4), 3, 32),       # odd cin, padded
])
def test_conv_matches_xla(shape, cin, cout):
    # own seed: the session rng's stream position depends on which tests
    # ran before, which makes a max-abs tolerance check order-dependent
    rng = np.random.default_rng(42 + cin + cout)
    x = jnp.asarray(rng.normal(size=(*shape, cin)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, 3, cin, cout)) * 0.1)
                    .astype(np.float32))
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32) * 0.1)
    y, sums = conv3d_in_act(x, identity_normact(cin), w, b,
                            out_dtype=jnp.float32, interpret=True)
    ref = _xla_conv(x.astype(jnp.bfloat16).astype(jnp.float32), w, b)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert float(jnp.max(jnp.abs(y - ref))) / scale < 0.02  # bf16 matmul
    # stats are exact sums over the valid region
    np.testing.assert_allclose(np.asarray(sums[0]),
                               np.asarray(jnp.sum(ref, (0, 1, 2))),
                               rtol=2e-2, atol=2e-1)


def test_fused_input_norm_act(rng):
    """Input-side IN+LReLU fusion == explicit normalize then conv."""
    shape, cin, cout = (10, 8, 12), 16, 16
    x = jnp.asarray(rng.normal(size=(*shape, cin)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, 3, cin, cout)) * 0.1)
                    .astype(np.float32))
    mean = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.5, 2.0, cin).astype(np.float32))
    gamma = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32))
    inv = 1.0 / jnp.sqrt(var + 1e-5)
    na = NormAct(mean, inv, gamma, beta, 0.01)

    xn = (x - mean) * inv * gamma + beta
    xn = jnp.where(xn >= 0, xn, xn * 0.01)
    ref = _xla_conv(xn.astype(jnp.bfloat16).astype(jnp.float32), w)

    y, sums = conv3d_in_act(x, na, w, None, slope=0.01,
                            out_dtype=jnp.float32, interpret=True)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert float(jnp.max(jnp.abs(y - ref))) / scale < 0.02
    # the emitted stats reproduce torch-style biased IN statistics
    m, istd = stats_from_sums(sums, int(np.prod(shape)))
    ref_mean = jnp.mean(ref, (0, 1, 2))
    ref_istd = 1.0 / jnp.sqrt(jnp.var(ref, (0, 1, 2)) + 1e-5)
    np.testing.assert_allclose(np.asarray(m), np.asarray(ref_mean),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(istd), np.asarray(ref_istd),
                               rtol=3e-2)


def test_pack_weights_structure():
    p, cin_p, cout_p = plan_packing(32, 32)
    assert (p, cin_p, cout_p) == (4, 32, 32)
    w = np.zeros((3, 3, 3, 32, 32), np.float32)
    w[1, 1, 1] = np.eye(32)
    pk = pack_weights(w, p, cin_p, cout_p)
    # center tap (dx=1, dy=1, g=0 → index 13): block-diagonal identity
    blk = pk[(1 * 3 + 1) * 3 + 1]
    for zo in range(p):
        for zi in range(p):
            sub = blk[zi * 32:(zi + 1) * 32, zo * 32:(zo + 1) * 32]
            np.testing.assert_array_equal(sub, np.eye(32) if zi == zo
                                          else np.zeros((32, 32)))


def test_plan_packing_rules():
    assert plan_packing(1, 32) == (4, 32, 32)
    assert plan_packing(32, 64) == (2, 64, 64)
    assert plan_packing(128, 128) == (1, 128, 128)
    assert plan_packing(256, 320) == (1, 256, 384)
    for cin, cout in [(3, 32), (32, 32), (64, 64), (320, 320)]:
        p, ci, co = plan_packing(cin, cout)
        assert (p * ci) % 128 == 0 and (p * co) % 128 == 0
