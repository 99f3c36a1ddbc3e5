"""Trainer-variant registry: trainer names → hyperparameter deltas.

Parity: `nnunetv2/training/nnUNetTrainer/variants/` — the reference
encodes hyperparameter variants as subclasses whose NAMES are stored in
checkpoints and task configs (epochs, mirroring, loss, augmentation).
This table reproduces the semantics of every variant the BOA model zoo
references (`totalsegmentator/python_api.py` trainer column +
`custom_trainers.py`), so converted checkpoints train/finetune with the
right recipe.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Callable


@dataclass(frozen=True)
class VariantSpec:
    num_epochs: int = 1000
    mirror_axes: tuple[int, ...] = (0, 1, 2)
    loss: str = "dice_ce"              # dice_ce | dice_topk10 | dice_bce
    initial_lr: float = 1e-2
    aggressive_da: bool = False        # DA5 augmentation preset
    seg_resample_order0: bool = False  # DASegOrd0: order-0 seg augmentation


VARIANTS: dict[str, VariantSpec] = {
    "nnUNetTrainer": VariantSpec(),
    "nnUNetTrainerNoMirroring": VariantSpec(mirror_axes=()),
    "nnUNetTrainer_4000epochs_NoMirroring": VariantSpec(
        num_epochs=4000, mirror_axes=()),
    "nnUNetTrainer_2000epochs_NoMirroring": VariantSpec(
        num_epochs=2000, mirror_axes=()),
    "nnUNetTrainer_1500epochs_NoMirroring": VariantSpec(
        num_epochs=1500, mirror_axes=()),
    "nnUNetTrainer_DASegOrd0": VariantSpec(seg_resample_order0=True),
    "nnUNetTrainer_DASegOrd0_NoMirroring": VariantSpec(
        mirror_axes=(), seg_resample_order0=True),
    "nnUNetTrainer_onlyMirror01": VariantSpec(mirror_axes=(0, 1)),
    # custom_trainers.py shim classes (checkpoint deserialization only in
    # the reference; real hyperparams here)
    "nnUNetTrainer_MOSAIC_1k_QuarterLR_NoMirroring": VariantSpec(
        num_epochs=1000, mirror_axes=(), initial_lr=1e-2 / 4),
    "nnUNetTrainerDiceTopK10Loss_2000epochs": VariantSpec(
        num_epochs=2000, loss="dice_topk10"),
    "nnUNetTrainerDA5": VariantSpec(aggressive_da=True),
}


def get_variant(trainer_name: str) -> VariantSpec:
    """Resolve a trainer name; unknown names parse `_NNNNepochs` and
    `NoMirroring` markers (recursive_find_python_class fallback)."""
    if trainer_name in VARIANTS:
        return VARIANTS[trainer_name]
    spec = VariantSpec()
    for part in trainer_name.split("_"):
        if part.endswith("epochs") and part[:-6].isdigit():
            spec = replace(spec, num_epochs=int(part[:-6]))
    if "NoMirroring" in trainer_name:
        spec = replace(spec, mirror_axes=())
    return spec


def apply_variant(cfg, trainer_name: str):
    """TrainConfig + trainer name → adjusted TrainConfig (+ mirror axes)."""
    spec = get_variant(trainer_name)
    cfg = replace(cfg, num_epochs=spec.num_epochs,
                  initial_lr=spec.initial_lr)
    return cfg, spec
