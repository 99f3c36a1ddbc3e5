"""Per-model predictor: preprocessed-volume -> segmentation, device-resident.

Parity: `nnunetv2/inference/predict_from_raw_data.py` `nnUNetPredictor`
(`:39`), collapsed into a single device pipeline:

  preprocess (crop-to-nonzero, CTNormalization, spline resample to plan
  spacing — `default_preprocessor.py:45-118`)
  -> pad to patch (`predict_from_raw_data.py:657`)
  -> sliding-window fold-ensemble logits (`:470-631`)
  -> revert padding, resample logits to pre-resample shape
     (`export_prediction.py:14-56`), argmax, re-insert into the nonzero bbox
     (`:57-77`).

The reference crosses two process boundaries (preprocess workers, export
pool) and a thread/queue device boundary per tile; here the host only
computes shapes/bboxes and the volume stays on the TPU throughout.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from boa_tpu.models.unet import ArchConfig
from boa_tpu.ops import preprocess as pp
from boa_tpu.ops import resample as rs
from boa_tpu.plans.plans import ModelPlans
from boa_tpu.inference.sliding_window import sliding_window_logits, stack_fold_params

ANISO_THRESHOLD = 3.0  # nnunetv2/configuration.py


def determine_separate_z(current_spacing, new_spacing,
                         threshold: float = ANISO_THRESHOLD):
    """(do_separate_z, axis) — parity: `default_resampling.py:33-67`."""

    def _sep(sp):
        return (np.max(sp) / np.min(sp)) > threshold

    def _axis(sp):
        return np.where(np.max(sp) / np.array(sp) == 1)[0]

    if _sep(current_spacing):
        axis = _axis(current_spacing)
    elif _sep(new_spacing):
        axis = _axis(new_spacing)
    else:
        return False, None
    if len(axis) != 1:
        return False, None
    return True, int(axis[0])


@dataclass
class Predictor:
    """Fold-ensemble sliding-window predictor for one model."""

    plans: ModelPlans
    fold_params: list  # one parameter pytree per fold
    tile_step_size: float = 0.5
    use_gaussian: bool = True
    mirror_axes: tuple[int, ...] = ()  # empty: NoMirroring (all BOA models)
    compute_dtype: str = "bfloat16"

    def __post_init__(self) -> None:
        self.cfg: ArchConfig = self.plans.arch_config()
        self._stacked = stack_fold_params(self.fold_params)
        self._dtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    # ------------------------------------------------------------------
    def predict_logits(self, vol_cxyz: np.ndarray | jax.Array) -> jax.Array:
        """Sliding-window logits for an already-preprocessed (C,X,Y,Z) volume."""
        patch = self.plans.patch_size_xyz
        vol = np.asarray(vol_cxyz, dtype=np.float32)
        padded, revert = pp.pad_to_patch(vol, patch)
        starts = pp.tile_starts(padded.shape[-3:], patch, self.tile_step_size)
        if self.use_gaussian:
            gauss = pp.gaussian_importance_map(patch)
        else:
            gauss = np.ones(patch, np.float32)
        logits = sliding_window_logits(
            self._stacked, jnp.asarray(padded), jnp.asarray(starts),
            jnp.asarray(gauss), self.cfg, self.mirror_axes, self._dtype)
        return logits[(slice(None), *revert)]

    # ------------------------------------------------------------------
    def predict(self, vol_xyz: np.ndarray, spacing_xyz) -> np.ndarray:
        """Full nnU-Net-equivalent prediction for a raw (X,Y,Z) volume at
        `spacing_xyz`; returns a uint8/uint16 label volume of the same shape.
        """
        assert self.plans.transpose_forward == [0, 1, 2], (
            "non-identity transpose_forward not yet supported")
        vol = np.asarray(vol_xyz, dtype=np.float32)
        orig_shape = vol.shape

        # 1. crop to nonzero (cropping.py:19-39)
        bbox = pp.nonzero_bbox(vol)
        cropped = pp.crop_to_bbox(vol, bbox)
        shape_before_resample = cropped.shape

        # 2. normalize BEFORE resampling (default_preprocessor.py:85-88)
        scheme = self.plans.normalization_schemes[0]
        dev = jnp.asarray(cropped)
        if scheme == "CTNormalization":
            dev = pp.ct_normalize(dev, self.plans.intensity_properties)
        elif scheme in ("ZScoreNormalization", "ZScore"):
            dev = pp.zscore_normalize(dev)
        else:
            raise NotImplementedError(f"normalization scheme {scheme}")

        # 3. resample to plan spacing (skimage/'resize' convention, order 3,
        #    separate-z order 0 when anisotropic)
        tgt_spacing = np.array(self.plans.spacing_xyz, dtype=np.float64)
        cur_spacing = np.array(spacing_xyz, dtype=np.float64)
        new_shape = rs.compute_new_shape(shape_before_resample, cur_spacing, tgt_spacing)
        do_sep, axis = determine_separate_z(cur_spacing, tgt_spacing)
        sep_z = 0 if (do_sep and axis == 2) else None
        if tuple(new_shape) != tuple(shape_before_resample):
            dev = rs.resample_volume(dev, tuple(new_shape), order=3,
                                     convention="resize", separate_z_order=sep_z)

        # 4. sliding window
        logits = self.predict_logits(dev[None])

        # 5. resample logits back to pre-resample shape (order 1), argmax
        if tuple(new_shape) != tuple(shape_before_resample):
            logits = rs.resample_volume(logits, shape_before_resample, order=1,
                                        convention="resize", separate_z_order=sep_z)
        seg_cropped = np.asarray(jnp.argmax(logits, axis=0))
        dt = np.uint8 if self.cfg.num_classes <= 255 else np.uint16
        seg_cropped = seg_cropped.astype(dt)

        # 6. re-insert into original shape at bbox (export_prediction.py:57-77)
        seg = np.zeros(orig_shape, dtype=dt)
        sl = tuple(slice(b[0], b[1]) for b in bbox)
        seg[sl] = seg_cropped
        return seg
