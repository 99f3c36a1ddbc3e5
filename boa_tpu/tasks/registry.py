"""Task registry: per-model inference configuration.

Parity: the task table inside `totalsegmentator/python_api.py:168-624`
(task ids, resample spacing, trainer, crop organs + addon, folds, license
gating) and the BCA task table `body_composition_analysis/tasks.py:15-48`
(ids 542/543, slice-thickness-only resample to 5 mm, 5 folds, fold 0 in fast
mode). The reference encodes this as a giant if/elif chain; here it is a
declarative table so schedulers/shape-bucketing can inspect it.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class TaskConfig:
    name: str
    task_ids: tuple[int, ...]
    # target spacing in mm; None = native spacing; one value = isotropic
    resample: tuple[float, float, float] | None
    trainer: str
    model: str = "3d_fullres"
    folds: tuple[int, ...] | None = (0,)
    crop: tuple[str, ...] | None = None  # organs from `total` used to crop
    crop_addon: tuple[int, int, int] = (3, 3, 3)
    # only resample slice thickness (z), keep in-plane spacing (BCA models)
    resample_only_thickness: bool = False
    license_required: bool = False
    # postprocessing
    remove_outside: tuple[str, ...] | None = None  # masks for remove-outside
    remove_outside_dilation_mm: float | None = None
    keep_largest_blob: bool = False
    multilabel: bool = True


def _iso(v: float) -> tuple[float, float, float]:
    return (v, v, v)


# --- TotalSegmentator tasks used by BOA (python_api.py task table) ---
TASKS: dict[str, TaskConfig] = {
    "total": TaskConfig(
        name="total",
        task_ids=(291, 292, 293, 294, 295),
        resample=_iso(1.5),
        trainer="nnUNetTrainerNoMirroring",
    ),
    "total_fast": TaskConfig(
        name="total_fast",
        task_ids=(297,),
        resample=_iso(3.0),
        trainer="nnUNetTrainer_4000epochs_NoMirroring",
    ),
    "total_fastest": TaskConfig(
        name="total_fastest",
        task_ids=(298,),
        resample=_iso(6.0),
        trainer="nnUNetTrainer_4000epochs_NoMirroring",
    ),
    "lung_vessels": TaskConfig(
        name="lung_vessels",
        task_ids=(258,),
        resample=None,
        trainer="nnUNetTrainer",
        crop=(
            "lung_upper_lobe_left",
            "lung_lower_lobe_left",
            "lung_upper_lobe_right",
            "lung_middle_lobe_right",
            "lung_lower_lobe_right",
        ),
    ),
    "cerebral_bleed": TaskConfig(
        name="cerebral_bleed",
        task_ids=(150,),
        resample=None,
        trainer="nnUNetTrainer",
        crop=("brain",),
    ),
    "hip_implant": TaskConfig(
        name="hip_implant",
        task_ids=(260,),
        resample=None,
        trainer="nnUNetTrainer",
        crop=("femur_left", "femur_right", "hip_left", "hip_right"),
    ),
    "body": TaskConfig(
        name="body",
        task_ids=(299,),
        resample=_iso(1.5),
        trainer="nnUNetTrainer",
        keep_largest_blob=True,
    ),
    "body_fast": TaskConfig(
        name="body_fast",
        task_ids=(300,),
        resample=_iso(6.0),
        trainer="nnUNetTrainer",
        keep_largest_blob=True,
    ),
    "pleural_pericard_effusion": TaskConfig(
        name="pleural_pericard_effusion",
        task_ids=(315,),
        resample=None,
        trainer="nnUNetTrainer",
        crop=(
            "lung_upper_lobe_left",
            "lung_lower_lobe_left",
            "lung_upper_lobe_right",
            "lung_middle_lobe_right",
            "lung_lower_lobe_right",
        ),
        crop_addon=(50, 50, 50),
        folds=None,
    ),
    "liver_vessels": TaskConfig(
        name="liver_vessels",
        task_ids=(8,),
        resample=None,
        trainer="nnUNetTrainer",
        crop=("liver",),
        crop_addon=(20, 20, 20),
    ),
    "liver_segments": TaskConfig(
        name="liver_segments",
        task_ids=(570,),
        resample=(0.8046879768371582, 0.8046879768371582, 1.5),
        trainer="nnUNetTrainerNoMirroring",
        crop=("liver",),
        crop_addon=(10, 10, 10),
    ),
    "heartchambers_highres": TaskConfig(
        name="heartchambers_highres",
        task_ids=(301,),
        resample=None,
        trainer="nnUNetTrainer",
        crop=("heart",),
        crop_addon=(5, 5, 5),
        remove_outside=("heart", "aorta", "inferior_vena_cava"),
        remove_outside_dilation_mm=10.0,
        license_required=True,
    ),
    "coronary_arteries": TaskConfig(
        name="coronary_arteries",
        task_ids=(507,),
        resample=(0.7, 0.7, 0.7),
        trainer="nnUNetTrainer_DASegOrd0_NoMirroring",
        model="3d_fullres_high",
        crop=("heart",),
        crop_addon=(20, 20, 20),
        license_required=True,
    ),
}

# --- BCA tasks (body_composition_analysis/tasks.py:15-48) ---
BCA_TASKS: dict[str, TaskConfig] = {
    "body_parts": TaskConfig(
        name="body_parts",
        task_ids=(543,),
        resample=(0.0, 0.0, 5.0),  # thickness-only; in-plane preserved
        trainer="nnUNetTrainer_1500epochs_NoMirroring",
        folds=(0, 1, 2, 3, 4),
        resample_only_thickness=True,
    ),
    "body_regions": TaskConfig(
        name="body_regions",
        task_ids=(542,),
        resample=(0.0, 0.0, 5.0),
        trainer="nnUNetTrainerNoMirroring",
        folds=(0, 1, 2, 3, 4),
        resample_only_thickness=True,
    ),
}


def get_task(name: str, fast: bool = False) -> TaskConfig:
    if name == "total":
        return TASKS["total_fast" if fast else "total"]
    if name == "body":
        return TASKS["body_fast" if fast else "body"]
    if name in TASKS:
        if fast:
            raise ValueError(f"task {name} does not support the fast option")
        return TASKS[name]
    if name in BCA_TASKS:
        cfg = BCA_TASKS[name]
        if fast:  # fast BCA = fold 0 only (infer/infer.py: fast -> folds=[0])
            return TaskConfig(**{**cfg.__dict__, "folds": (0,)})
        return cfg
    raise KeyError(f"unknown task {name!r}")
