"""Real-TPU StreamRunner throughput bench: mixed-z studies, bucket 64.

Reports per-study wall seconds and volumes/min/chip — the serving
throughput metric of BASELINE.md (reference analogue: N Celery workers
x 1 study each, docker-compose.yml). Uses synthetic weights at real
fast-total scale (no egress for the published checkpoints).

Run from the repo root: python tools/stream_bench.py [n_studies]
"""
import logging
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")

from boa_tpu.io.nifti import NiftiImage
from boa_tpu.serve.stream import StreamRunner, StudyJob
from boa_tpu.tasks.class_maps import get_class_map
from boa_tpu.weights.store import ModelStore, create_synthetic_model


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    tmp = tempfile.mkdtemp()
    label_names = ["background"] + list(get_class_map("total").values())
    create_synthetic_model(
        tmp, 297, "TotalSegmentator_total_3mm_1559subj",
        num_classes=len(label_names),
        trainer="nnUNetTrainer_4000epochs_NoMirroring",
        patch_size=(128, 128, 128), spacing=(3.0, 3.0, 3.0),
        features=(32, 64, 128, 256, 320, 320), n_folds=1,
        label_names=label_names)
    store = ModelStore(tmp)

    rng = np.random.default_rng(0)
    zs = [290, 300, 310, 295, 305, 300]
    jobs = []
    for i in range(n):
        z = zs[i % len(zs)]
        gx = np.linspace(-1, 1, 512, dtype=np.float32)[:, None]
        gy = np.linspace(-1, 1, 512, dtype=np.float32)[None, :]
        body = (gx ** 2 / 0.49 + gy ** 2 / 0.36) < 1.0
        base = np.where(body, 40.0, -1000.0).astype(np.float32)
        vol = (base[:, :, None] +
               12.0 * rng.standard_normal((512, 512, z), dtype=np.float32)
               ).astype(np.int16)
        affine = np.diag([-1.5, -1.5, 3.0, 1.0])
        affine[:3, 3] = (200.0, 180.0, -400.0)
        jobs.append(StudyJob(study_id=f"s{i}",
                             image=NiftiImage(data=vol, affine=affine)))

    runner = StreamRunner(store=store, task="total", fast=True,
                          write_outputs=False)
    stats = runner.run(jobs)
    print("per-study:", [round(s, 2) for s in stats.per_study_s])
    print(f"total {stats.total_s:.1f}s  "
          f"volumes/min/chip: {stats.volumes_per_min:.2f}")


if __name__ == "__main__":
    main()
