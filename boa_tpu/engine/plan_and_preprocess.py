"""Dataset workflow: raw nnU-Net-layout dataset → fingerprint → plans →
preprocessed case store.

Parity: the `nnUNetv2_plan_and_preprocess` entry point
(`nnunetv2/experiment_planning/plan_and_preprocess_entrypoints.py`):
reads `imagesTr/` + `labelsTr/` + `dataset.json`, extracts the dataset
fingerprint, plans the 3d_fullres configuration, and preprocesses every
case (crop-to-nonzero → CT normalize → resample to plan spacing → store
with class locations) into a `CaseStore` ready for
`boa_tpu.train.run_training`.

Usage:
    python -m boa_tpu.engine.plan_and_preprocess DATASET_DIR OUT_DIR
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)


def _case_ids(dataset_dir: Path) -> list[str]:
    stems = []
    for p in (dataset_dir / "imagesTr").glob("*.nii*"):
        name = p.name
        for suffix in (".nii.gz", ".nii"):
            if name.endswith(suffix):
                name = name[: -len(suffix)]
        stems.append(name)
    # an _NNNN tail is only the nnU-Net channel suffix when the case's
    # _0000 channel exists — a plain id that happens to end in 4 digits
    # (patient_0001.nii.gz without channels) must keep its full name
    all_stems = set(stems)
    ids = set()
    for name in stems:
        if name[-5:-4] == "_" and name[-4:].isdigit() \
                and f"{name[:-5]}_0000" in all_stems:
            name = name[:-5]
        ids.add(name)
    return sorted(ids)


def _load_case(dataset_dir: Path, cid: str):
    from boa_tpu.io import nifti

    img_p = None
    for cand in (f"{cid}_0000.nii.gz", f"{cid}_0000.nii",
                 f"{cid}.nii.gz", f"{cid}.nii"):
        if (dataset_dir / "imagesTr" / cand).exists():
            img_p = dataset_dir / "imagesTr" / cand
            break
    if img_p is None:
        raise FileNotFoundError(f"no image for case {cid}")
    img = nifti.load(img_p)
    seg = None
    for cand in (f"{cid}.nii.gz", f"{cid}.nii"):
        if (dataset_dir / "labelsTr" / cand).exists():
            seg = nifti.load(dataset_dir / "labelsTr" / cand)
            break
    return img, seg


def plan_and_preprocess(dataset_dir: str | Path, out_dir: str | Path,
                        hbm_target_gb: float = 8.0,
                        configurations: tuple = ("3d_fullres",)) -> dict:
    """Returns the plans dict; writes plans.json, fingerprint.json and one
    preprocessed case store per requested configuration under `out_dir`
    (`cases/` for 3d_fullres, `cases_<name>/` otherwise — e.g. pass
    ("3d_fullres", "3d_lowres") to stage a cascade training run).
    Configurations the planner did not emit (e.g. no 3d_lowres on a small
    dataset) are skipped with a log line."""
    from boa_tpu.engine.fingerprint import extract_fingerprint
    from boa_tpu.engine.planner import plan_experiment
    from boa_tpu.ops import preprocess as pp
    from boa_tpu.ops import resample as rs
    from boa_tpu.train.dataset import CaseStore

    import jax.numpy as jnp

    dataset_dir, out_dir = Path(dataset_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    dataset_json = json.loads((dataset_dir / "dataset.json").read_text())
    labels = dataset_json.get("labels", {})
    num_classes = len({int(v) for v in labels.values()
                       if not isinstance(v, (list, tuple))}) or 2

    ids = _case_ids(dataset_dir)
    if not ids:
        raise FileNotFoundError(f"no training cases in {dataset_dir}")
    logger.info("planning over %d cases", len(ids))

    def gen():
        for cid in ids:
            img, seg = _load_case(dataset_dir, cid)
            yield (np.asarray(img.data),
                   np.asarray(seg.data) if seg is not None else None,
                   img.zooms)

    fingerprint = extract_fingerprint(gen(),
                                      out_file=out_dir / "fingerprint.json")
    plans = plan_experiment(fingerprint, num_classes,
                            out_file=out_dir / "plans.json",
                            hbm_target_gb=hbm_target_gb)
    props = plans["foreground_intensity_properties_per_channel"]["0"]

    # resolve each requested configuration once (inheritance, spacing,
    # target store) ...
    targets: list[tuple[str, np.ndarray, "CaseStore"]] = []
    for config in configurations:
        if config not in plans["configurations"]:
            logger.info("configuration %r not planned for this dataset, "
                        "skipping its preprocessing", config)
            continue
        conf = dict(plans["configurations"][config])
        while conf.get("inherits_from"):  # cascade configs inherit spacing
            base = dict(plans["configurations"][conf.pop("inherits_from")])
            base.update(conf)
            conf = base
        if "spacing" not in conf or len(conf["spacing"]) != 3:
            logger.info("configuration %r is not 3D, skipping", config)
            continue
        target = np.asarray(conf["spacing"], np.float64)
        sub = "cases" if config == "3d_fullres" else f"cases_{config}"
        targets.append((config, target, CaseStore(out_dir / sub)))

    # ... then load/crop/normalize each case ONCE and only resample per
    # configuration — for cascade runs (fullres + lowres) this halves the
    # heaviest host work (NIfTI reads + full-volume clip/normalize passes
    # on the single slow core)
    for cid in ids if targets else []:
        img, seg = _load_case(dataset_dir, cid)
        data = np.asarray(img.data, np.float32)
        segd = np.asarray(seg.data) if seg is not None else \
            np.zeros(data.shape, np.int8)
        bbox = pp.nonzero_bbox(data)
        sl = tuple(slice(b[0], b[1]) for b in bbox)
        data, segd = data[sl], segd[sl]
        # CT normalize with the dataset fingerprint
        data = np.clip(data, props["percentile_00_5"],
                       props["percentile_99_5"])
        data = (data - props["mean"]) / max(props["std"], 1e-8)
        cur = np.asarray(img.zooms, np.float64)
        for config, target, store in targets:
            new_shape = rs.compute_new_shape(data.shape, cur, target)
            d, s = data, segd
            if tuple(new_shape) != data.shape:
                d = np.asarray(rs.resample_volume(
                    jnp.asarray(data), tuple(new_shape), order=3,
                    convention="resize"))
                s = np.asarray(rs.resample_nearest(
                    jnp.asarray(segd), tuple(new_shape),
                    convention="resize"))
            store.save_case(cid, d, s)
            logger.info("preprocessed %s [%s] -> %s", cid, config,
                        tuple(new_shape))
    return plans


def main(argv=None) -> None:
    ap = argparse.ArgumentParser("boa_tpu-plan-and-preprocess")
    ap.add_argument("dataset_dir", type=Path)
    ap.add_argument("out_dir", type=Path)
    ap.add_argument("--hbm-gb", type=float, default=8.0)
    ap.add_argument("-c", "--configurations", nargs="+",
                    default=["3d_fullres"],
                    help="configurations to preprocess case stores for "
                         "(e.g. 3d_fullres 3d_lowres for a cascade run)")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    plan_and_preprocess(args.dataset_dir, args.out_dir, args.hbm_gb,
                        configurations=tuple(args.configurations))


if __name__ == "__main__":
    main()
