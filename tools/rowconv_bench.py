"""Row-conv kernel vs XLA on the r4 roofline floor stages (real TPU).

Times conv+IN-stats+LReLU at the flagship co=32 @128³ shapes named in the
README roofline (enc0.conv2 / dec4.conv1 / dec4.conv2) with on-device
inputs (no tunnel bulk transfers), scan-of-N inside one jit, scalar
readback sync, dispatch subtracted via an empty scan.

Run from the repo root: python tools/rowconv_bench.py [--iters 10]
"""
import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bx", type=int, default=8)
    ap.add_argument("--bz", type=int, default=1)
    ap.add_argument("--g4", action="store_true",
                    help="4-row-packed M=128 kernel variant")
    ap.add_argument("--stages", default="32,64",
                    help="comma list of cin values to bench (32 and/or 64)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from boa_tpu.ops import rowconv

    Z = X = Y = 128

    def stage(cin, cout, label):
        key = jax.random.key(0)
        xp = jax.random.normal(key, (Z + 2, X + 2, cin, Y), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, 3, cin, cout), jnp.float32) * 0.1
        pack = (rowconv.pack_weights_rows_g4 if args.g4
                else rowconv.pack_weights_rows)
        wp = jnp.asarray(pack(np.asarray(w), cin, cout), jnp.bfloat16)
        norm_mat = jnp.stack([jnp.zeros(cin), jnp.ones(cin),
                              jnp.ones(cin), jnp.zeros(cin),
                              jnp.ones(cin)]).astype(jnp.float32)
        bias = jnp.zeros((1, 4 * cout if args.g4 else cout), jnp.float32)

        @jax.jit
        def run_kernel(xp):
            # the input must DEPEND on the carry or XLA hoists the
            # loop-invariant conv out of the scan and runs it once (first
            # version of this bench reported 1400+ TF/s that way); `* 0`
            # keeps values unchanged but is not folded (no fast-math)
            def body(c, _):
                y, s = rowconv._rowconv(
                    xp + c, norm_mat, wp, bias, slope=0.01,
                    out_dtype=jnp.bfloat16, interpret=False, Z=Z, X=X, Y=Y,
                    cin_p=cin, cout_p=cout, bx=args.bx, bz=args.bz,
                    g4=args.g4)
                return (s[0].reshape(-1)[0] * 0).astype(xp.dtype), None

            out, _ = jax.lax.scan(body, jnp.zeros((), xp.dtype), None,
                                  length=args.iters)
            return out

        # XLA reference: same semantics (norm+act fused into conv by XLA),
        # z-major batched-2D decomposition is the shipped fast path — use
        # the plain NDHWC conv AND report both
        x_nhwc = jax.random.normal(key, (1, Z, X, Y, cin), jnp.bfloat16)
        k = w.astype(jnp.bfloat16)

        @jax.jit
        def run_xla(v):
            def body(c, _):
                y = jax.lax.conv_general_dilated(
                    v + c, k, (1, 1, 1), "SAME",
                    dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
                    preferred_element_type=jnp.float32)
                y = jnp.where(y >= 0, y, y * 0.01).astype(jnp.bfloat16)
                return (y[0, 0, 0, 0, 0] * 0).astype(v.dtype), None

            out, _ = jax.lax.scan(body, jnp.zeros((), v.dtype), None,
                                  length=args.iters)
            return out

        # the SHIPPED fast path (models/unet.py z-major batched-2D
        # decomposition + IN + LReLU) — the baseline the kernel must beat
        from boa_tpu.models.unet import (_conv_zm, _lrelu, _same_pad,
                                         instance_norm)

        xzm = jax.random.normal(key, (1, Z, X, Y, cin), jnp.bfloat16)

        @jax.jit
        def run_zm(v):
            def body(c, _):
                y = _conv_zm(v + c, k, None, (1, 1, 1),
                             _same_pad((3, 3, 3)))
                y = instance_norm(y, None, None, 1e-5, axes=(1, 2, 3))
                y = _lrelu(y, 0.01)
                return (y[0, 0, 0, 0, 0] * 0).astype(v.dtype), None

            out, _ = jax.lax.scan(body, jnp.zeros((), v.dtype), None,
                                  length=args.iters)
            return out

        @jax.jit
        def empty(v):
            return jnp.sum(v[0, 0, 0]).astype(jnp.float32)

        float(empty(xp))  # warm dispatch
        t0 = time.perf_counter(); float(empty(xp))
        disp = time.perf_counter() - t0

        float(run_kernel(xp))  # compile
        t0 = time.perf_counter(); float(run_kernel(xp))
        tk = (time.perf_counter() - t0 - disp) / args.iters

        float(run_xla(x_nhwc))
        t0 = time.perf_counter(); float(run_xla(x_nhwc))
        tx = (time.perf_counter() - t0 - disp) / args.iters

        float(run_zm(xzm))
        t0 = time.perf_counter(); float(run_zm(xzm))
        tz = (time.perf_counter() - t0 - disp) / args.iters

        gflop = 2 * 27 * cin * cout * Z * X * Y / 1e9
        print(f"{label}: kernel {tk*1e3:.2f} ms ({gflop/tk/1e3:.1f} TF/s)  "
              f"conv3d {tx*1e3:.2f} ms ({gflop/tx/1e3:.1f} TF/s)  "
              f"shipped-zm {tz*1e3:.2f} ms ({gflop/tz/1e3:.1f} TF/s)",
              flush=True)

    # tiny smoke first: distinguishes Mosaic lowering failures from
    # tunnel wedges before committing to the big compiles
    from boa_tpu.ops import rowconv as rc

    xs = jax.random.normal(jax.random.key(1), (6, 8, 32, 128), jnp.float32)
    ws = jax.random.normal(jax.random.key(2), (3, 3, 3, 32, 32),
                           jnp.float32) * 0.1
    ys, ss = rc.conv3d_rows(xs, rc.identity_normact(32), ws, None,
                            slope=0.01, bx=args.bx, bz=min(args.bz, 2),
                            g4=args.g4)
    print(f"smoke ok: {float(jnp.sum(ss[0])):.3f}", flush=True)

    wanted = {int(s) for s in args.stages.split(",")}
    if 32 in wanted:
        stage(32, 32, "c32->c32 @128^3 (enc0.conv2/dec4.conv2)")
    if 64 in wanted:
        stage(64, 32, "c64->c32 @128^3 (dec4.conv1)")


if __name__ == "__main__":
    main()
