"""Headline benchmark: fast-total study inference end-to-end, one chip.

Runs the full TotalSegmentator-level pipeline (`boa_tpu.inference.pipeline.
predict_image`, parity `totalsegmentator/nnunet.py:326-829`) on a synthetic
512×512×300 CT at 1.5×1.5×3 mm: canonical RAS → cubic device resample to
the 3 mm model grid → sliding-window inference with Gaussian fusion →
multilabel postprocess → order-0 resample back → undo canonical.

Weights are synthetic (randomly initialized) at the real `total_fast`
architecture (task 297: 6-stage PlainConvUNet, 32→320 features, 118
classes, patch 128³, step 0.8): identical FLOPs/memory traffic to the
converted public checkpoints.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the driver north-star of 10 s for a full
512×512×600 study (BASELINE.md) scaled to this volume's z extent
(300/600 → 5 s target); >1.0 means faster than target.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np


def main() -> None:
    import sys

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # sitecustomize forces the axon backend; the env var alone does
        # not stick (CLAUDE.md) — honor it for CPU smoke runs
        jax.config.update("jax_platforms", "cpu")

    from boa_tpu.inference.pipeline import predict_image
    from boa_tpu.io.nifti import NiftiImage
    from boa_tpu.weights.store import ModelStore, create_synthetic_model

    # first-dispatch heartbeat for the _watchdog parent: a client that
    # attaches right after another died mid-RPC can wedge forever HERE
    import jax.numpy as jnp

    float(jnp.sum(jnp.ones((8, 8))))
    print("BENCH_FIRST_OP_OK", file=sys.stderr, flush=True)

    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        shape, spacing = (512, 512, 300), (1.5, 1.5, 3.0)
        patch, feats = (128, 128, 128), (32, 64, 128, 256, 320, 320)
        target_s = 5.0
    else:  # CPU smoke fallback so the script always emits a line
        shape, spacing = (96, 96, 64), (1.5, 1.5, 3.0)
        patch, feats = (32, 32, 32), (8, 16, 32)
        target_s = 60.0

    tmp = tempfile.mkdtemp(prefix="boa_bench_")
    from boa_tpu.tasks.class_maps import get_class_map

    label_names = ["background"] + list(get_class_map("total").values())
    mdir = create_synthetic_model(
        tmp, 297, "TotalSegmentator_total_3mm_1559subj",
        num_classes=len(label_names),
        trainer="nnUNetTrainer_4000epochs_NoMirroring",
        patch_size=patch, spacing=(3.0, 3.0, 3.0), features=feats,
        n_folds=1, label_names=label_names)
    # random-init logits are near-tied across 118 classes, so the argmax is
    # spatial noise — unlike real checkpoints whose outputs are organ-sized
    # regions. Bias the seg head so the synthetic model also yields coherent
    # regions: keeps FLOPs identical and the label-volume downloads
    # representative of production entropy.
    from boa_tpu.weights import convert as _cv
    from boa_tpu.plans.plans import ModelPlans

    plans0 = ModelPlans.from_model_folder(mdir)
    p0 = _cv.load_params_npz(mdir / "fold_0" / "checkpoint_final.npz",
                             plans0.arch_config())
    rng0 = np.random.default_rng(7)
    head = p0["seg_heads"][-1]
    head["b"] = head["b"] + np.asarray(
        rng0.normal(0, 3.0, head["b"].shape), head["b"].dtype)
    _cv.save_params_npz(p0, mdir / "fold_0" / "checkpoint_final.npz")
    store = ModelStore(tmp)

    # synthetic anatomy: air background, soft-tissue ellipsoid, bone-ish
    # core, mild noise — realistic CT entropy (real CTs are smooth + air)
    rng = np.random.default_rng(0)
    gx = np.linspace(-1, 1, shape[0], dtype=np.float32)[:, None]
    gy = np.linspace(-1, 1, shape[1], dtype=np.float32)[None, :]
    body = (gx ** 2 / 0.49 + gy ** 2 / 0.36) < 1.0
    core = (gx ** 2 / 0.04 + gy ** 2 / 0.04) < 1.0
    base = np.where(body, 40.0, -1000.0).astype(np.float32)
    base += np.where(core, 660.0, 0.0).astype(np.float32)
    vol = base[:, :, None] + 12.0 * rng.standard_normal(shape, dtype=np.float32)
    affine = np.diag([-spacing[0], -spacing[1], spacing[2], 1.0])
    affine[:3, 3] = (200.0, 180.0, -400.0)
    img = NiftiImage(data=vol.astype(np.int16), affine=affine)

    # warmup compiles the bucketed shapes
    res = predict_image(img, "total", store, fast=True)
    assert res.seg.shape == shape

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = predict_image(img, "total", store, fast=True)
        times.append(time.perf_counter() - t0)
    sec = float(min(times))

    print(json.dumps({
        "metric": "sec_per_512x512x300_fast_total_study" if on_tpu
                  else "sec_cpu_smoke_study",
        "value": round(sec, 3),
        "unit": "s",
        "vs_baseline": round(target_s / sec, 3),
    }))


def _watchdog() -> int:
    """Run main() in a child, guarding against a wedged TPU client.

    A client that attaches right after another died mid-RPC can wedge
    forever on its FIRST dispatch (0 CPU, threads in futex waits —
    CLAUDE.md tunnel notes); a merely slow/cold run completes that first
    tiny op within a minute even in bad tunnel weather. So: wait up to
    240 s for the child's first-op heartbeat, kill + retry in a fresh
    process if it never comes (the wedge clears when the wedged process
    dies), and let a heartbeat-confirmed run take as long as it needs.
    """
    import subprocess
    import sys
    import threading

    env = dict(os.environ, BOA_BENCH_CHILD="1")
    # 4 TPU attempts, then one CPU-forced smoke run: during a full tunnel
    # OUTAGE (observed: every client wedges on op 1 for hours) the smoke
    # line still gives the driver a structurally valid artifact, clearly
    # labeled sec_cpu_smoke_study rather than the TPU metric.
    for attempt in range(5):
        if attempt == 4:
            print("bench: TPU unreachable after 4 attempts; falling back "
                  "to the CPU smoke metric", file=sys.stderr)
            env = dict(env, JAX_PLATFORMS="cpu")
        proc = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                                env=env, stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, text=True)
        beat = threading.Event()
        stderr_tail: list[str] = []

        def drain(p=proc, b=beat, tail=stderr_tail):
            for line in p.stderr:
                if "BENCH_FIRST_OP_OK" in line:
                    b.set()
                tail.append(line)
                del tail[:-40]

        t = threading.Thread(target=drain, daemon=True)
        t.start()
        if not beat.wait(timeout=240):
            print(f"bench attempt {attempt}: no first-op heartbeat in 240 s "
                  f"(wedged TPU client?); killing and retrying",
                  file=sys.stderr)
            proc.kill()
            proc.wait()
            time.sleep(30)  # let the tunnel shed the dead client
            continue
        out_text = proc.stdout.read()  # stderr is drained by the thread
        proc.wait()
        out = [ln for ln in out_text.splitlines() if ln.startswith("{")]
        if proc.returncode == 0 and out:
            print(out[-1])
            return 0
        print("".join(stderr_tail)[-2000:], file=sys.stderr)
    return 1


if __name__ == "__main__":
    if os.environ.get("BOA_BENCH_CHILD") == "1":
        main()
    else:
        raise SystemExit(_watchdog())
