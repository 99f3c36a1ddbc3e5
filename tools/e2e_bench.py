"""Production-scale analyze_ct total+bca benchmark on the real TPU.

Runs the FULL study pipeline (fast total + fast BCA + measurements +
metrics + contrast + preview + report PDF + Excel) on a synthetic
512x512x300 CT with synthetic weights at real architecture scale, twice:
the first run pays the XLA compiles, the second is the steady-state
number. Per-stage INFO logs show the split; BOA_PIPELINE_TIMING=1 adds
predict_image spans.

Synthetic weights are cached under --workdir (default /tmp/boa_e2e_fixed)
because creating them costs minutes of tunneled-TPU param-init traffic.

Run from the repo root: python tools/e2e_bench.py [--runs 2]
"""
import argparse
import json
import logging
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def ensure_weights(wroot: str) -> None:
    from boa_tpu.bca.definitions import BodyPart, BodyRegion
    from boa_tpu.tasks.class_maps import get_class_map
    from boa_tpu.weights.store import create_synthetic_model

    if os.path.exists(os.path.join(wroot, "Dataset543_BCA_body_parts")):
        print("weights already present, skipping creation", flush=True)
        return
    label_names = ["background"] + list(get_class_map("total").values())
    create_synthetic_model(
        wroot, 297, "TotalSegmentator_total_3mm_1559subj",
        num_classes=len(label_names),
        trainer="nnUNetTrainer_4000epochs_NoMirroring",
        patch_size=(128, 128, 128), spacing=(3.0, 3.0, 3.0),
        features=(32, 64, 128, 256, 320, 320), n_folds=1,
        label_names=label_names)
    create_synthetic_model(
        wroot, 542, "BCA_body_regions", num_classes=max(BodyRegion) + 1,
        trainer="nnUNetTrainerNoMirroring", patch_size=(160, 160, 48),
        spacing=(1.5, 1.5, 5.0), features=(32, 64, 128, 256, 320),
        n_folds=1,
        label_names=["background"] + [r.name for r in
                                      sorted(BodyRegion, key=int)])
    create_synthetic_model(
        wroot, 543, "BCA_body_parts", num_classes=max(BodyPart) + 1,
        trainer="nnUNetTrainer_1500epochs_NoMirroring",
        patch_size=(160, 160, 48), spacing=(1.5, 1.5, 5.0),
        features=(32, 64, 128, 256, 320), n_folds=1,
        label_names=["background"] + [r.name for r in
                                      sorted(BodyPart, key=int)])


def ensure_fullres_weights(wroot: str) -> None:
    """Synthetic full-res models: the 5 `total` sub-models (task ids
    291-295 @ 1.5 mm iso, the reference's default non-fast ensemble,
    `totalsegmentator/python_api.py:168-214`) + 5-fold BCA models (full
    BCA runs all folds, `infer/infer.py`). Flagship 6-stage arch at real
    per-part class counts."""
    from boa_tpu.bca.definitions import BodyPart, BodyRegion
    from boa_tpu.tasks import class_maps
    from boa_tpu.weights.store import create_synthetic_model

    for tid in (291, 292, 293, 294, 295):
        pm = class_maps.class_map_5_parts[class_maps.map_taskid_to_partname[tid]]
        part = class_maps.map_taskid_to_partname[tid].replace(
            "class_map_part_", "")
        if os.path.exists(os.path.join(
                wroot, f"Dataset{tid}_TotalSegmentator_{part}")):
            continue
        label_names = ["background"] + [pm[k] for k in sorted(pm)]
        print(f"creating synthetic full-res model {tid} ({part}, "
              f"{len(label_names)} classes)", flush=True)
        create_synthetic_model(
            wroot, tid, f"TotalSegmentator_{part}",
            num_classes=len(label_names), trainer="nnUNetTrainerNoMirroring",
            patch_size=(128, 128, 128), spacing=(1.5, 1.5, 1.5),
            features=(32, 64, 128, 256, 320, 320), n_folds=1,
            label_names=label_names)
    for tid, name, enum, trainer in (
            (542, "BCA_body_regions", BodyRegion, "nnUNetTrainerNoMirroring"),
            (543, "BCA_body_parts", BodyPart,
             "nnUNetTrainer_1500epochs_NoMirroring")):
        if os.path.exists(os.path.join(
                wroot, f"Dataset{tid}_{name}",
                f"{trainer}__nnUNetPlans__3d_fullres", "fold_4")):
            continue
        print(f"creating synthetic 5-fold BCA model {tid}", flush=True)
        create_synthetic_model(
            wroot, tid, name, num_classes=max(enum) + 1, trainer=trainer,
            patch_size=(160, 160, 48), spacing=(1.5, 1.5, 5.0),
            features=(32, 64, 128, 256, 320), n_folds=5,
            label_names=["background"] + [r.name for r in sorted(enum, key=int)])


def synthetic_ct(path: str) -> None:
    from boa_tpu.io import nifti

    rng = np.random.default_rng(0)
    gx = np.linspace(-1, 1, 512, dtype=np.float32)[:, None]
    gy = np.linspace(-1, 1, 512, dtype=np.float32)[None, :]
    body = (gx ** 2 / 0.49 + gy ** 2 / 0.36) < 1.0
    base = np.where(body, 40.0, -1000.0).astype(np.float32)
    vol = (base[:, :, None] + 12.0 * rng.standard_normal(
        (512, 512, 300), dtype=np.float32)).astype(np.int16)
    affine = np.diag([-1.5, -1.5, 3.0, 1.0])
    affine[:3, 3] = (200.0, 180.0, -400.0)
    nifti.save(nifti.NiftiImage(data=vol, affine=affine), path)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/boa_e2e_fixed")
    ap.add_argument("--profile", action="store_true",
                    help="cProfile the last run and print the top sinks")
    ap.add_argument("--realistic", action="store_true",
                    help="anatomy-phantom CT + fake_predict realistic "
                    "labels: measures the HOST pipeline on plausible "
                    "segmentations (device predict excluded; bench.py "
                    "measures that). This is the VERDICT r1 #3 metric.")
    ap.add_argument("--full-res", action="store_true", dest="full_res",
                    help="the TRUE north-star mode: non-fast total (5 sub-"
                    "models @1.5mm) + non-fast BCA (5 folds), REAL device "
                    "inference on synthetic full-res weights with realistic "
                    "fake labels feeding the host stages (fake_predict."
                    "run_real). Implies --realistic.")
    ap.add_argument("--slices", type=int, default=300,
                    help="z slices of the phantom (600 = the BASELINE.md "
                    "north-star 512x512x600 shape)")
    ap.add_argument("--zspacing", type=float, default=3.0,
                    help="z voxel spacing in mm (1.0 with --slices 600 "
                    "matches a thin-slice whole-torso study)")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    os.makedirs(args.workdir, exist_ok=True)
    wroot = os.path.join(args.workdir, "weights")
    os.environ["BOA_WEIGHTS_PATH"] = wroot
    fake = None
    if args.full_res:
        args.realistic = True
    if args.realistic:
        from boa_tpu.io import nifti
        from boa_tpu.testing import anatomy

        suffix = "" if (args.slices, args.zspacing) == (300, 3.0) \
            else f"_{args.slices}_{args.zspacing:g}"
        ct_path = os.path.join(args.workdir, f"anatomy{suffix}.nii.gz")
        if not os.path.exists(ct_path):
            affine = np.diag([-1.5, -1.5, args.zspacing, 1.0])
            affine[:3, 3] = (200.0, 180.0, -400.0)
            nifti.save(nifti.NiftiImage(
                data=anatomy.synth_ct(
                    shape=(512, 512, args.slices),
                    spacing=(1.5, 1.5, args.zspacing)),
                affine=affine), ct_path)
        fake = anatomy.fake_predict_factory()
        if args.full_res:
            ensure_fullres_weights(wroot)
            fake.run_real = True
    else:
        ensure_weights(wroot)
        ct_path = os.path.join(args.workdir, "image.nii.gz")
        if not os.path.exists(ct_path):
            synthetic_ct(ct_path)

    from boa_tpu.commands import analyze_ct

    for run in range(args.runs):
        profiler = None
        if args.profile and run == args.runs - 1:
            import cProfile
            profiler = cProfile.Profile()
            profiler.enable()
        out = tempfile.mkdtemp(prefix=f"boa_e2e_out{run}_")
        t0 = time.perf_counter()
        _, stats = analyze_ct(
            input_folder=ct_path, processed_output_folder=out,
            excel_output_folder=out, models=["total", "bca"],
            compute_contrast_information=True, total_preview=True,
            bca_pdf=True, fast_total=not args.full_res,
            fast_bca=not args.full_res, fake_predict=fake)
        wall = time.perf_counter() - t0
        print(f"run{run}: wall={wall:.1f}s stats=" + json.dumps(
            {k: round(v, 2) for k, v in stats.items()
             if isinstance(v, (int, float))}), flush=True)
        if profiler is not None:
            import pstats
            profiler.disable()
            pstats.Stats(profiler).sort_stats("tottime").print_stats(25)


if __name__ == "__main__":
    main()
