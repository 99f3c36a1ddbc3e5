"""Full flagship forward: XLA fast path vs BOA_ROWCONV=1 (real TPU).

BOA_ROWCONV is read at TRACE time (models/unet.py:_rowconv_enabled), so a
legitimate A/B needs fresh processes — this script runs ITSELF twice as
subprocesses with the env set each way and reports both medians.

Measures unet_infer on the flagship 6-stage 25-class config at a 128^3
patch, scan-of-N inside one jit with a scalar carry dependency (see
tools/rowconv_bench.py for why the input must depend on the carry),
scalar-readback sync, dispatch subtracted via an empty-scan baseline.

Run from the repo root: python tools/forward_ab_bench.py [--iters 20]
"""
import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")


def child(iters: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from boa_tpu.models.unet import ArchConfig, init_unet, unet_forward

    cfg = ArchConfig(
        n_stages=6, features_per_stage=(32, 64, 128, 256, 320, 320),
        kernel_sizes=((3, 3, 3),) * 6,
        strides=((1, 1, 1),) + ((2, 2, 2),) * 5,
        n_conv_per_stage=(2,) * 6, n_conv_per_stage_decoder=(2,) * 5,
        num_classes=25)
    params = init_unet(jax.random.key(0), cfg)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 else a, params)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 128, 128, 128, 1)), jnp.bfloat16)

    @jax.jit
    def run(x):
        def body(c, _):
            y = unet_forward(params, x + c, cfg)
            return (y[0, 0, 0, 0, 0] * 0).astype(x.dtype), None

        c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None,
                            length=iters)
        return c

    @jax.jit
    def empty(x):
        return jnp.sum(x[0, 0, 0, :, 0]).astype(jnp.float32)

    float(empty(x))
    t0 = time.perf_counter(); float(empty(x))
    disp = time.perf_counter() - t0

    float(run(x))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(run(x))
        ts.append((time.perf_counter() - t0 - disp) / iters)
    ms = float(np.median(ts)) * 1e3
    # flagship forward ~1.05 TFLOP (README roofline)
    print(f"ROWCONV={os.environ.get('BOA_ROWCONV', '0')}: "
          f"{ms:.2f} ms/fwd ({1050.0 / ms:.1f} TF/s effective)", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--child", action="store_true")
    args = ap.parse_args()
    if args.child:
        child(args.iters)
        return
    for flag in ("0", "1"):
        env = dict(os.environ, BOA_ROWCONV=flag)
        r = subprocess.run(
            [sys.executable, __file__, "--child",
             "--iters", str(args.iters)], env=env)
        if r.returncode != 0:
            print(f"child BOA_ROWCONV={flag} failed rc={r.returncode}")
        time.sleep(10)  # let the tunnel client settle between processes


if __name__ == "__main__":
    main()
