"""Model weight store: on-disk layout, torch import, synthetic zoo.

Parity (reshaped): TotalSegmentator's weights manager
(`totalsegmentator/libs.py:120-240` download+unzip per task id into
``TOTALSEG_WEIGHTS_PATH``) and nnU-Net's results-folder convention
(``DatasetXXX_name/trainer__plans__configuration/fold_N/checkpoint_final.pth``,
`predict_from_raw_data.py:83-120`).

This store keeps the same folder convention but holds converted JAX
parameter archives (``checkpoint_final.npz``). `import_torch_model_folder`
converts a real nnU-Net/TotalSegmentator weights folder in place;
`create_synthetic_model` builds a randomly-initialized model for tests and
benchmarking (no egress is available to download the published weights).
"""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path

import jax
import numpy as np

from boa_tpu.models.unet import init_unet
from boa_tpu.plans.plans import ModelPlans, synthetic_plans
from boa_tpu.weights import convert as cv

DEFAULT_WEIGHTS_ENV = "BOA_WEIGHTS_PATH"

logger = logging.getLogger(__name__)


def weights_root() -> Path:
    root = os.environ.get(DEFAULT_WEIGHTS_ENV)
    if root:
        return Path(root)
    return Path.home() / ".boa_tpu" / "weights"


class ModelStore:
    """Resolves (task_id, trainer, configuration) -> (plans, fold params)."""

    def __init__(self, root: str | Path | None = None):
        self.root = Path(root) if root else weights_root()

    def model_dir(self, task_id: int, trainer: str = "nnUNetTrainer",
                  plans_name: str = "nnUNetPlans", model: str = "3d_fullres") -> Path:
        matches = sorted(self.root.glob(f"Dataset{task_id:03d}_*"))
        if not matches:
            raise FileNotFoundError(
                f"No weights for task {task_id} under {self.root}. "
                f"Download the published TotalSegmentator/BCA weights and run "
                f"`python -m boa_tpu.weights.manager import <folder>` "
                f"(no network egress is available to fetch them automatically).")
        return matches[0] / f"{trainer}__{plans_name}__{model}"

    def load(self, task_id: int, trainer: str = "nnUNetTrainer",
             model: str = "3d_fullres", folds=(0,)) -> tuple[ModelPlans, list]:
        mdir = self.model_dir(task_id, trainer, model=model)
        plans = ModelPlans.from_model_folder(mdir, configuration=model
                                             if model in json.loads(
                                                 (mdir / "plans.json").read_text()
                                             )["configurations"] else "3d_fullres")
        cfg = plans.arch_config()
        if folds is None:  # None = all available folds (python_api folds=None)
            folds = sorted(int(p.name.split("_")[1]) for p in mdir.glob("fold_*"))
        params = []
        for f in folds:
            fdir = mdir / f"fold_{f}"
            npz = fdir / "checkpoint_final.npz"
            if npz.exists():
                params.append(cv.load_params_npz(npz, cfg))
            else:
                pth = fdir / "checkpoint_final.pth"
                if not pth.exists():
                    raise FileNotFoundError(f"missing checkpoint for fold {f} in {mdir}")
                p = cv.convert_checkpoint(pth, cfg)
                cv.save_params_npz(p, npz)  # cache converted form
                params.append(p)
        return plans, params


def import_torch_model_folder(src: str | Path, dst_root: str | Path | None = None) -> Path:
    """Convert an nnU-Net results folder (torch checkpoints) into the store."""
    src = Path(src)
    root = Path(dst_root) if dst_root else weights_root()
    plans = ModelPlans.from_model_folder(src)
    cfg = plans.arch_config()
    rel = src.relative_to(src.parents[1])  # Dataset.../trainer__plans__model
    dst = root / rel
    dst.mkdir(parents=True, exist_ok=True)
    for name in ["plans.json", "dataset.json"]:
        (dst / name).write_bytes((src / name).read_bytes())
    for fold_dir in sorted(src.glob("fold_*")):
        params = cv.convert_checkpoint(fold_dir / "checkpoint_final.pth", cfg)
        out = dst / fold_dir.name
        out.mkdir(exist_ok=True)
        cv.save_params_npz(params, out / "checkpoint_final.npz")
    return dst


def export_trained_model(
    training_dir: str | Path,
    task_id: int,
    name: str,
    root: str | Path | None = None,
    trainer: str = "nnUNetTrainer",
    fold: int = 0,
    checkpoint: str = "checkpoint_final.pkl",
) -> Path:
    """Turn a train/run_training output into a servable store entry.

    Closes the train->serve loop the reference gets from nnU-Net's shared
    results folder (`predict_from_raw_data.py:83-120` serves straight
    from the training output): reads the trainer checkpoint + the
    export_meta.json the training run wrote, grafts target spacing /
    intensity normalization / label names from the preprocessing plans
    (cases_dir parent) when available, and writes
    ``DatasetXXX_name/trainer__nnUNetPlans__3d_fullres/fold_N/
    checkpoint_final.npz`` so `ModelStore.load` / `predict_image` can use
    the model directly.
    """
    import pickle

    training_dir = Path(training_dir)
    meta = json.loads((training_dir / "export_meta.json").read_text())
    with open(training_dir / checkpoint, "rb") as f:
        blob = pickle.load(f)
    params = blob["params"]

    spacing = (1.0, 1.0, 1.0)
    label_names = None
    intensity = None
    prep_dir = Path(meta.get("cases_dir", training_dir)).parent
    prep_plans_path = prep_dir / "plans.json"
    if prep_plans_path.exists():
        prep_plans = json.loads(prep_plans_path.read_text())
        cfg3d = prep_plans.get("configurations", {}).get("3d_fullres", {})
        spacing = tuple(cfg3d.get("spacing", spacing))
        intensity = prep_plans.get(
            "foreground_intensity_properties_per_channel")
    else:
        logger.warning(
            "Preprocessing plans not found at %s: exporting with 1 mm "
            "spacing and synthetic intensity normalization — serving "
            "resampling/normalization will NOT match training. Re-export "
            "with the case store available.", prep_plans_path)
    ds_json = prep_dir.parent / "dataset.json"
    for cand in (prep_dir / "dataset.json", ds_json):
        if cand.exists():
            labels = json.loads(cand.read_text()).get("labels")
            if labels:
                # synthetic_plans re-adds background; pass classes 1..N
                label_names = [n for n, v in sorted(
                    ((n, v) for n, v in labels.items()
                     if not isinstance(v, (list, tuple)) and int(v) != 0),
                    key=lambda kv: int(kv[1]))]
            break
    if label_names is not None and len(label_names) != meta["num_classes"] - 1:
        logger.warning(
            "dataset.json lists %d foreground labels but the checkpoint "
            "has %d classes; using generic class names",
            len(label_names), meta["num_classes"] - 1)
        label_names = None

    plans = synthetic_plans(
        num_classes=meta["num_classes"],
        patch_size=tuple(meta["patch_size"]),
        spacing=spacing,
        features=tuple(meta["features_per_stage"]),
        label_names=label_names)
    if intensity:
        plans.plans["foreground_intensity_properties_per_channel"] = intensity

    mdir = _write_store_entry(
        Path(root) if root else weights_root(), task_id, name, trainer,
        plans, {fold: params})
    return mdir


def _write_store_entry(root: Path, task_id: int, name: str, trainer: str,
                       plans, fold_params: dict) -> Path:
    """Materialize plans + per-fold params in the store layout."""
    mdir = Path(root) / f"Dataset{task_id:03d}_{name}" / \
        f"{trainer}__nnUNetPlans__3d_fullres"
    mdir.mkdir(parents=True, exist_ok=True)
    (mdir / "plans.json").write_text(json.dumps(plans.plans))
    (mdir / "dataset.json").write_text(json.dumps(plans.dataset))
    for fold, params in fold_params.items():
        fdir = mdir / f"fold_{fold}"
        fdir.mkdir(exist_ok=True)
        cv.save_params_npz(jax.tree.map(np.asarray, params),
                           fdir / "checkpoint_final.npz")
    return mdir


def create_synthetic_model(
    root: str | Path,
    task_id: int,
    name: str,
    num_classes: int,
    trainer: str = "nnUNetTrainer",
    patch_size=(32, 32, 32),
    spacing=(3.0, 3.0, 3.0),
    features=(8, 16, 32),
    n_folds: int = 1,
    label_names: list[str] | None = None,
    seed: int = 0,
) -> Path:
    """Materialize a synthetic model into the store layout (tests/bench)."""
    plans = synthetic_plans(num_classes=num_classes, patch_size=patch_size,
                            spacing=spacing, features=features,
                            label_names=label_names)
    cfg = plans.arch_config()
    fold_params = {
        f: init_unet(jax.random.key(seed + task_id * 10 + f), cfg)
        for f in range(n_folds)}
    return _write_store_entry(Path(root), task_id, name, trainer, plans,
                              fold_params)
