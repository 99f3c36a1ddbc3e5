"""Cold-start (first-study) latency measurement on the real TPU.

VERDICT r1 weak #6: make cold-start a measured, reported number. Each
measurement runs in a FRESH subprocess (new jit caches); `--mode warm`
runs `serve.warmup.warmup_task` for the study's bucketed shape first, so
the first study hits pre-compiled programs; `--mode cold` measures the
raw first-study cost; `--mode nocache` additionally disables the
persistent compilation cache (BOA_JAX_CACHE=0) for the
worst-case-fresh-machine number.

Run from the repo root:
    python tools/coldstart_bench.py --mode cold
    python tools/coldstart_bench.py --mode warm
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, ".")
import numpy as np

mode = sys.argv[1]
workdir = sys.argv[2]
os.environ["BOA_WEIGHTS_PATH"] = os.path.join(workdir, "weights")

t_import = time.perf_counter()
import boa_tpu  # noqa: F401  (enables the persistent compile cache)
from boa_tpu.inference.pipeline import predict_image
from boa_tpu.io import nifti
from boa_tpu.weights.store import ModelStore

store = ModelStore()
timings = {"import_s": time.perf_counter() - t_import}

if mode == "warm":
    from boa_tpu.serve.warmup import warmup_task
    t0 = time.perf_counter()
    warmup_task(store, "total", fast=True, xy=512, z_range=(300, 301),
                bucket=64)
    timings["warmup_s"] = time.perf_counter() - t0

img = nifti.load(os.path.join(workdir, "anatomy.nii.gz"))
t0 = time.perf_counter()
res = predict_image(img, "total", store, fast=True)
timings["first_study_s"] = time.perf_counter() - t0
t0 = time.perf_counter()
res = predict_image(img, "total", store, fast=True)
timings["second_study_s"] = time.perf_counter() - t0
print("COLDSTART " + json.dumps(timings))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["cold", "warm", "nocache"],
                    default="cold")
    ap.add_argument("--workdir", default="/tmp/boa_e2e_fixed")
    args = ap.parse_args()

    ct = os.path.join(args.workdir, "anatomy.nii.gz")
    if not os.path.exists(ct) or not os.path.exists(
            os.path.join(args.workdir, "weights", "Dataset297_"
                         "TotalSegmentator_total_3mm_1559subj")):
        # reuse the e2e bench fixtures (phantom CT + synthetic weights)
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import e2e_bench

        os.makedirs(args.workdir, exist_ok=True)
        os.environ["BOA_WEIGHTS_PATH"] = os.path.join(args.workdir, "weights")
        e2e_bench.ensure_weights(os.environ["BOA_WEIGHTS_PATH"])
        if not os.path.exists(ct):
            from boa_tpu.io import nifti
            from boa_tpu.testing import anatomy
            import numpy as np

            affine = np.diag([-1.5, -1.5, 3.0, 1.0])
            nifti.save(nifti.NiftiImage(data=anatomy.synth_ct(),
                                        affine=affine), ct)

    env = dict(os.environ)
    mode = args.mode
    if mode == "nocache":
        env["BOA_JAX_CACHE"] = "0"
        mode = "cold"
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(CHILD)
        child = f.name
    try:
        proc = subprocess.run([sys.executable, child, mode, args.workdir],
                              env=env, capture_output=True, text=True,
                              timeout=3600, cwd=".")
        for line in proc.stdout.splitlines():
            if line.startswith("COLDSTART "):
                data = json.loads(line[len("COLDSTART "):])
                data["mode"] = args.mode
                print(json.dumps(data))
                return
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
        raise SystemExit(f"child failed rc={proc.returncode}")
    finally:
        os.unlink(child)


if __name__ == "__main__":
    main()
