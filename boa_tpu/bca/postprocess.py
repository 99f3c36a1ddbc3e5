"""BCA segmentation postprocessing.

Parity:
* `body_composition_analysis/body_regions/postprocess.py:18-40` — unique-
  segment rules: keep only the largest connected component globally, for
  thorax∪mediastinum∪pericardium, and for pericardium & abdominal cavity
  individually; removed fragments are set to 255 (ignore value).
  Reference uses skimage.measure.label => 26-connectivity.
* `body_composition_analysis/body_parts/postprocess.py:7-52` — per-label 2D
  contour fill (cv2) + removal of objects and holes < 3000 voxels
  (26-connectivity).
"""

from __future__ import annotations

import numpy as np

from boa_tpu.bca.definitions import BodyRegion
from boa_tpu.ops import connected_components as cc

IGNORE_VALUE = 255


def _filter_largest_unique_segment(seg: np.ndarray, mask: np.ndarray) -> None:
    # bbox via axis projections (np.nonzero builds ~3x 8-byte index
    # arrays over the whole foreground: ~2 s per call on this host)
    proj = [mask.any(axis=(1, 2)), mask.any(axis=(0, 2)),
            mask.any(axis=(0, 1))]
    if not proj[0].any():
        return
    box = tuple(slice(int(np.argmax(p)),
                      int(len(p) - np.argmax(p[::-1]))) for p in proj)
    labels, n = cc.label(mask[box], connectivity=3)
    if n <= 1:
        return
    sizes = cc.component_sizes(labels, n)
    sizes[0] = 0
    keep = int(np.argmax(sizes))
    sub = seg[box]
    sub[(labels > 0) & (labels != keep)] = IGNORE_VALUE
    seg[box] = sub


def _filter_largest_by_lut(seg: np.ndarray, region_labels) -> None:
    """keep-largest over {seg in region_labels}: fused native path (no
    mask/labels volumes), generic fallback otherwise."""
    lut = np.zeros(256, np.uint8)
    for lb in np.atleast_1d(region_labels):
        lut[int(lb)] = 1
    if cc.keep_largest_lut_inplace(seg, lut, connectivity=3,
                                   ignore_value=IGNORE_VALUE):
        return
    _filter_largest_unique_segment(seg, lut[seg].astype(bool))


def postprocess_region_segmentation(seg: np.ndarray) -> np.ndarray:
    out = np.ascontiguousarray(seg, dtype=np.uint8).copy() \
        if not (seg.dtype == np.uint8 and seg.flags.c_contiguous) \
        else seg.copy()
    # all labels except background and the ignore value
    _filter_largest_by_lut(out, list(range(1, 255)))
    _filter_largest_by_lut(out, [int(BodyRegion.THORACIC_CAVITY),
                                 int(BodyRegion.MEDIASTINUM),
                                 int(BodyRegion.PERICARDIUM)])
    for region in (BodyRegion.PERICARDIUM, BodyRegion.ABDOMINAL_CAVITY):
        _filter_largest_by_lut(out, int(region))
    return out


def _fill_2d_contours(label_mask: np.ndarray) -> np.ndarray:
    """Slice-wise external-contour fill along the z axis (x,y,z volume).

    Works in a z-major copy: slicing `[:, :, k]` of an (x, y, z) volume
    gathers with stride nz — 300 such slices cost ~8 s of cache misses
    on this host, vs ~2 s for two layout transposes + contiguous slices.
    """
    import cv2

    # order="C": plain astype keeps the transposed strides (order="K"),
    # leaving every zxy[k] slice a stride-nz gather for cv2 to re-copy
    zxy = np.moveaxis(label_mask, 2, 0).astype(np.uint8, order="C")
    out = np.zeros_like(zxy)
    canvas = np.zeros(zxy.shape[1:], np.uint8)
    for k in range(zxy.shape[0]):
        contours, _ = cv2.findContours(zxy[k], cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
        if not contours:
            continue
        canvas[:] = 0  # cv2 needs a standalone Mat, not a subarray view
        cv2.drawContours(canvas, contours, -1, color=1, thickness=cv2.FILLED)
        out[k] = canvas
    return np.ascontiguousarray(np.moveaxis(out, 0, 2)) > 0


def remove_small_labeled_objects(mask: np.ndarray, threshold: int = 3000) -> np.ndarray:
    """Contour-fill then remove objects/holes smaller than `threshold` voxels.

    Note: skimage remove_small_objects(max_size=threshold-1) removes
    components with size <= threshold - 1, i.e. keeps size >= threshold.
    """
    out = np.zeros(mask.shape, dtype=mask.dtype)
    # one native histogram pass lists the labels (np.unique sorts 78M
    # voxels; np.bincount upcasts them to a 630 MB int64 temp), and ONE
    # find_objects pass yields every label's bbox — the per-label work
    # below then never touches the full volume (a `mask == label` compare
    # plus three axis-projections per label cost ~4 full passes each on
    # this host)
    if mask.dtype == np.uint8:
        present = np.nonzero(cc.histogram_u8(mask))[0]
    else:
        present = np.nonzero(np.bincount(
            mask.ravel().astype(np.intp), minlength=1))[0]
    from scipy import ndimage

    boxes = ndimage.find_objects(mask, max_label=int(present.max(initial=0)))
    import os

    use_native = os.environ.get("BOA_NATIVE_PARTS", "1") not in ("0", "false")
    for label_value in present:
        if label_value == 0:
            continue
        raw = boxes[int(label_value) - 1]
        if raw is None:
            continue
        # pad the bbox by 1 voxel of background: contour fill is per-slice
        # local, and the hole inversion stays exact because the pad ring
        # keeps the outside background connected. One body part typically
        # spans a fraction of the scan, so the 2x CC passes shrink too.
        lo = [max(s.start - 1, 0) for s in raw]
        hi = [min(s.stop + 1, n) for s, n in zip(raw, mask.shape)]
        if use_native and mask.dtype == np.uint8:
            # fused native path: fill + object/hole filtering in one call
            # (one zxy slab + run-based CC instead of ~6 bbox-sized
            # numpy/cv2 passes — the torso label's bbox is ~the volume)
            ring = (lo[0] > 0, hi[0] < mask.shape[0],
                    lo[1] > 0, hi[1] < mask.shape[1],
                    lo[2] > 0, hi[2] < mask.shape[2])
            done = cc.parts_postprocess_label(
                mask, int(label_value), tuple(zip(lo, hi)), ring,
                int(threshold), out)
            if done is not None:
                continue
        box = tuple(slice(a, b) for a, b in zip(lo, hi))
        filled = _fill_2d_contours(mask[box] == label_value)
        # remove small foreground objects (keep >= threshold)
        filled = cc.filter_components_by_size(
            filled, (threshold - 1, np.inf), connectivity=3).astype(bool)
        if not filled.any():   # nothing survived: the holes pass would be a
            continue           # full dense-CC over pure background
        # remove small holes: background components touching a PAD-RING
        # face (the 1-voxel background ring added around the bbox) are the
        # outside background and are always kept; a face where the bbox
        # was clamped to the volume edge carries no ring, so components
        # there follow the plain size threshold — exactly what the
        # whole-volume reference (`body_parts/postprocess.py:7-52`
        # remove_small_holes) does with a face-touching pocket.
        inv_labels, n = cc.label(~filled, connectivity=3)
        sizes = cc.component_sizes(inv_labels, n)
        keep = sizes >= threshold
        ring_faces = []
        if lo[0] > 0:
            ring_faces.append(inv_labels[0])
        if hi[0] < mask.shape[0]:
            ring_faces.append(inv_labels[-1])
        if lo[1] > 0:
            ring_faces.append(inv_labels[:, 0])
        if hi[1] < mask.shape[1]:
            ring_faces.append(inv_labels[:, -1])
        if lo[2] > 0:
            ring_faces.append(inv_labels[..., 0])
        if hi[2] < mask.shape[2]:
            ring_faces.append(inv_labels[..., -1])
        for face in ring_faces:
            keep[np.unique(face)] = True
        keep[0] = False  # label 0 = foreground region of the inversion
        filled = ~keep[inv_labels]
        sub = out[box]
        sub[filled] = label_value
        out[box] = sub
    return out


def postprocess_part_segmentation(seg: np.ndarray) -> np.ndarray:
    return remove_small_labeled_objects(seg.astype(np.uint8, copy=False))
