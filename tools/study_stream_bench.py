"""Full total+bca STUDY-STREAM throughput on the real TPU.

BASELINE.md asks for "CT volumes/min/chip (total+bca)". This drives N
back-to-back analyze_ct studies sharing one HostWorker, so each study's
deferred host tails (preview render, report PDF) overlap the next
study's device time — the serving shape of the PACS worker, one chip.

Run 0 pays the XLA compiles; the reported rate uses runs 1..N-1.

Run from the repo root: python tools/study_stream_bench.py [n_studies]
"""
import json
import logging
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    logging.basicConfig(level=logging.WARNING)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    workdir = "/tmp/boa_e2e_fixed"
    os.makedirs(workdir, exist_ok=True)
    os.environ["BOA_WEIGHTS_PATH"] = os.path.join(workdir, "weights")

    from boa_tpu.io import nifti
    from boa_tpu.testing import anatomy

    ct_path = os.path.join(workdir, "anatomy.nii.gz")
    if not os.path.exists(ct_path):
        affine = np.diag([-1.5, -1.5, 3.0, 1.0])
        affine[:3, 3] = (200.0, 180.0, -400.0)
        nifti.save(nifti.NiftiImage(data=anatomy.synth_ct(), affine=affine),
                   ct_path)
    fake = anatomy.fake_predict_factory()

    from boa_tpu.commands import analyze_ct
    from boa_tpu.utils.stages import HostWorker

    walls = []
    with HostWorker() as worker:
        for i in range(n):
            out = tempfile.mkdtemp(prefix=f"boa_stream{i}_")
            t0 = time.perf_counter()
            analyze_ct(input_folder=ct_path, processed_output_folder=out,
                       excel_output_folder=out, models=["total", "bca"],
                       compute_contrast_information=True, total_preview=True,
                       bca_pdf=True, fast_total=True, fast_bca=True,
                       fake_predict=fake, worker=worker)
            walls.append(time.perf_counter() - t0)
            print(f"study{i}: {walls[-1]:.1f}s", flush=True)
    warm = walls[1:] if len(walls) > 1 else walls
    rate = 60.0 / (sum(warm) / len(warm))
    print("STREAM " + json.dumps({
        "n": n, "warm_median_s": round(float(np.median(warm)), 1),
        "total_bca_volumes_per_min_per_chip": round(rate, 2)}), flush=True)


if __name__ == "__main__":
    main()
