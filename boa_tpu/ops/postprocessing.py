"""Multilabel postprocessing.

Parity: `totalsegmentator/postprocessing.py:13-177` — keep_largest_blob
(`:13-21`), keep_largest_blob_multilabel (`:24-43`), remove_small_blobs
(`:46-74`), remove_small_blobs_multilabel (`:77-98`), remove_outside_of_mask
(`:101-131`), extract_skin (`:134-164`).
"""

from __future__ import annotations

import numpy as np

from boa_tpu.ops import connected_components as cc
from boa_tpu.ops import morphology


def keep_largest_blob(mask: np.ndarray) -> np.ndarray:
    return cc.largest_component(mask > 0.5, connectivity=1)


def keep_largest_blob_multilabel(data: np.ndarray, class_map: dict[int, str],
                                 rois: list[str]) -> np.ndarray:
    """For each named roi, keep only its largest connected component."""
    out = data.copy()
    inv = {v: k for k, v in class_map.items()}
    for roi in rois:
        idx = inv[roi]
        roi_mask = data == idx
        if not roi_mask.any():
            continue
        cleaned = keep_largest_blob(roi_mask.astype(np.uint8)) > 0.5
        out[roi_mask & ~cleaned] = 0
    return out


def remove_small_blobs(mask: np.ndarray, interval=(10, 30)) -> np.ndarray:
    return cc.filter_components_by_size(mask > 0.5, interval, connectivity=1)


def remove_small_blobs_multilabel(data: np.ndarray, class_map: dict[int, str],
                                  rois: list[str],
                                  interval=(10, 30)) -> np.ndarray:
    out = data.copy()
    inv = {v: k for k, v in class_map.items()}
    for roi in rois:
        idx = inv[roi]
        roi_mask = data == idx
        if not roi_mask.any():
            continue
        cleaned = remove_small_blobs(roi_mask.astype(np.uint8), interval) > 0.5
        out[roi_mask & ~cleaned] = 0
    return out


def remove_outside_of_mask(seg: np.ndarray, mask: np.ndarray,
                           addon: int = 1) -> np.ndarray:
    """Zero segmentation voxels outside the `addon`-times-dilated mask.

    Parity: `postprocessing.py:101-131` (dilation with default cross
    structure, iterations=addon).
    """
    dilated = morphology.binary_dilation_cross(mask > 0.5, iterations=addon)
    out = seg.copy()
    out[dilated == 0] = 0
    return out


def extract_skin(ct_data: np.ndarray, body_mask: np.ndarray) -> np.ndarray:
    """Skin = (dilated body − eroded body) ∩ HU in [-200, 250].

    Parity: `postprocessing.py:134-164`.
    """
    body = (body_mask > 0.5).astype(np.uint8)
    outer = morphology.binary_dilation_cross(body, iterations=1)
    inner = morphology.binary_erosion_cross(body, iterations=3)
    skin = outer.astype(np.int8) - inner.astype(np.int8)
    skin = (skin > 0).astype(np.uint8)
    # reference keeps STRICTLY inside (-200, 250): boundary HUs excluded
    skin[ct_data <= -200] = 0
    skin[ct_data >= 250] = 0
    skin = remove_small_blobs(skin, interval=(5, 1e10))
    return skin.astype(np.uint8)


def remove_auxiliary_labels(seg: np.ndarray, task_name: str) -> np.ndarray:
    """Zero the indices of the task's `{task}_auxiliary` class map, when
    one exists (appendicular_bones, face_mr, kidney_cysts) — training-only
    helper classes the reference strips before export
    (`postprocessing.py:167-176`, called at `nnunet.py:592`)."""
    from boa_tpu.tasks import class_maps

    try:
        aux = class_maps.get_class_map(task_name + "_auxiliary")
    except KeyError:
        return seg
    lut = np.arange(max(int(seg.max()), max(aux)) + 1, dtype=seg.dtype)
    for idx in aux:
        lut[int(idx)] = 0
    return lut[seg]
