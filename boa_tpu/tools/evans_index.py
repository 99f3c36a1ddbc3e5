"""Evans index from ventricle + brain/skull segmentations.

Parity: `totalsegmentator/bin/totalseg_evans_index.py` — Evans index =
(max transverse diameter of the frontal horns) / (max inner-skull
transverse diameter), measured on the slice of the maximal horn diameter
(`max_diameter_x:55-79`), plus ventricle/brain volumes and a rendered
overview image. The reference aligns the head with an ANTs atlas
registration first; here in-plane head rotation is normalized from the
brain mask's axial principal axes (`inplane_rotation_deg`) — atlas-free,
covering the dominant pose error for transverse diameters; out-of-plane
tilt remains a documented deviation (BOA gates on axial CTs, |nz|>=0.85).
"""

from __future__ import annotations

import json
import logging
import math
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

FRONTAL_HORN_LABELS = ("frontal_horn_left", "frontal_horn_right")


def inner_skull_cavity(brain_mask: np.ndarray,
                       skull_mask: np.ndarray | None) -> np.ndarray:
    """Inner-skull cavity: brain dilated 2 iterations (to fill the
    brain-CSF gap), skull voxels removed, largest blob
    (`totalseg_evans_index.py:246-252`). Without a skull mask the raw
    brain is returned — unconstrained dilation would overestimate the
    transverse diameter."""
    if skull_mask is None or not skull_mask.any():
        return brain_mask
    from scipy import ndimage

    from boa_tpu.ops.connected_components import largest_component

    cavity = ndimage.binary_dilation(brain_mask, iterations=2)
    cavity[skull_mask > 0] = 0
    return largest_component(cavity).astype(bool)


def inplane_rotation_deg(brain_mask: np.ndarray,
                         spacing=(1.0, 1.0)) -> float:
    """In-plane head rotation from the brain mask's axial second moments.

    The reference normalizes head pose with an ANTs atlas registration
    (`bin/totalseg_evans_index.py` + `registration.py`); the dominant
    error source for the transverse Evans diameters is IN-PLANE rotation,
    which the principal axis of the axial (x, y) point cloud recovers
    without an atlas: the head's anterior-posterior extent is the major
    axis, so the measurement frame rotates it onto +y. Returns degrees in
    (-45, 45]; out-of-plane tilt remains a documented deviation.
    """
    idx = np.argwhere(brain_mask)
    if len(idx) < 16:
        return 0.0
    xy = idx[:, :2].astype(np.float64) * np.asarray(spacing[:2])  # mm space
    xy -= xy.mean(axis=0)
    cov = xy.T @ xy / len(xy)
    evals, evecs = np.linalg.eigh(cov)
    major = evecs[:, int(np.argmax(evals))]  # (x, y) of the AP axis
    ang = math.degrees(math.atan2(-major[0], major[1]))  # 0 when AP == +y
    if ang > 90:
        ang -= 180
    elif ang <= -90:
        ang += 180
    # a >45° estimate means the axial silhouette is wider than it is long
    # (atypical anatomy or bad mask) — distrust it and measure unrotated
    return float(ang) if abs(ang) <= 45.0 else 0.0


def _rotate_masks_inplane(deg: float, *masks: np.ndarray):
    """Order-0 in-plane rotation about the volume center (scipy host op —
    head volumes are small and this runs once per study).

    The grid is padded to the in-plane diagonal first so an off-center
    head can never be clipped at the edge by the reshape=False rotation
    (the downstream diameters are translation-invariant, so the pad
    offset is harmless)."""
    from scipy import ndimage as ndi

    x, y = masks[0].shape[:2]
    diag = int(np.ceil(np.hypot(x, y)))
    px = (diag - x) // 2 + 1
    py = (diag - y) // 2 + 1
    out = []
    for m in masks:
        mp = np.pad(m.astype(np.uint8), ((px, px), (py, py), (0, 0)))
        out.append(ndi.rotate(mp, deg, axes=(1, 0), reshape=False,
                              order=0, prefilter=False) > 0)
    return tuple(out)


def max_diameter_x(mask: np.ndarray):
    """((diameter_vox, (start, end))) over all z slices — exact
    `totalseg_evans_index.py:55-79` scan."""
    best = (0, ([0, 0, 0], [0, 0, 0]))
    for z in range(mask.shape[2]):
        sl = mask[:, :, z]
        for y in range(sl.shape[1]):
            x_idx = np.where(sl[:, y])[0]
            if len(x_idx):
                d = int(x_idx[-1] - x_idx[0])
                if d > best[0]:
                    best = (d, ([int(x_idx[0]), y, z],
                                [int(x_idx[-1]), y, z]))
    return best


_ATLAS_PATH = (Path(__file__).resolve().parents[1] / "resources" /
               "ct_brain_atlas_1mm.nii.gz")


def align_to_atlas(ct: np.ndarray, spacing, masks: list[np.ndarray],
                   atlas_data: np.ndarray | None = None,
                   atlas_spacing: float = 1.0,
                   levels=(4, 2), steps_per_level: int = 150
                   ) -> tuple[list[np.ndarray], dict] | None:
    """Affine-register the head CT to the brain atlas on TPU and warp the
    masks into atlas space.

    Parity: `totalsegmentator/bin/totalseg_evans_index.py` +
    `registration.py:12+` (ANTs AffineFast to ct_brain_atlas_1mm) —
    re-done as jitted NCC gradient descent (`boa_tpu/ops/registration`).
    Returns (warped_masks, info) or None when no atlas is available.
    """
    from scipy import ndimage as ndi

    from boa_tpu.ops.registration import register_affine, warp_labels

    if atlas_data is None:
        if not _ATLAS_PATH.exists():
            return None
        from boa_tpu.io import nifti

        atlas_data = np.asarray(nifti.load(_ATLAS_PATH).data)
    # patient volume to the atlas voxel size (order-1 CT, order-0 masks)
    zoom = tuple(float(s) / atlas_spacing for s in spacing)
    ct_iso = ndi.zoom(np.asarray(ct, np.float32), zoom, order=1)
    masks_iso = [ndi.zoom(m.astype(np.uint8), zoom, order=0) for m in masks]
    # brain soft-tissue window drives the similarity
    fixed = np.clip(np.asarray(atlas_data, np.float32), 0.0, 100.0)
    moving = np.clip(ct_iso, 0.0, 100.0)
    params, matrix, ncc = register_affine(fixed, moving, levels=levels,
                                          steps_per_level=steps_per_level)
    warped = [warp_labels(m, matrix, fixed.shape) for m in masks_iso]
    info = {"ncc": round(float(ncc), 4),
            "rotation_deg": [round(float(np.degrees(r)), 2)
                             for r in np.asarray(params.rotation)],
            "translation_vox": [round(float(t), 2)
                                for t in np.asarray(params.translation)]}
    return warped, info


def evans_index(ventricle_seg: np.ndarray,
                ventricle_label_map: dict[int, str],
                brain_mask: np.ndarray,
                spacing, plot_file: str | Path | None = None,
                ct: np.ndarray | None = None,
                atlas_data: np.ndarray | None = None,
                atlas_spacing: float = 1.0,
                registration_steps: int = 150,
                skull_mask: np.ndarray | None = None) -> dict:
    inv = {v: k for k, v in ventricle_label_map.items()}
    horns = np.isin(ventricle_seg,
                    [inv[n] for n in FRONTAL_HORN_LABELS if n in inv])
    if not horns.any() or not brain_mask.any():
        return {"success": False,
                "reason": "empty ventricle or brain segmentation"}
    # volumes come from the UNROTATED masks (an order-0 in-place rotation
    # clips off-center anatomy at the grid edge and jitters counts);
    # brain volume = inner-skull cavity, like the reference (`:252-256`
    # computes it after the dilate/skull-removal/largest-blob step)
    ml_per_voxel = float(np.prod(spacing)) / 1000.0
    vent_vol = float((ventricle_seg > 0).sum()) * ml_per_voxel
    brain_vol = float(inner_skull_cavity(brain_mask, skull_mask).sum()) \
        * ml_per_voxel

    # preferred path: full atlas registration (reference parity); the
    # in-plane moment alignment below is the CT-less fallback
    measure_spacing = float(spacing[0])
    rot_deg = 0.0
    atlas_info = None
    warp_masks = [horns, brain_mask] + (
        [skull_mask] if skull_mask is not None else [])
    if ct is not None:
        try:
            aligned = align_to_atlas(ct, spacing, warp_masks,
                                     atlas_data=atlas_data,
                                     atlas_spacing=atlas_spacing,
                                     steps_per_level=registration_steps)
        except Exception:
            logger.exception("atlas registration failed; falling back")
            aligned = None
        if aligned is not None and aligned[1]["ncc"] >= 0.5 \
                and aligned[0][0].any() and aligned[0][1].any():
            warped, atlas_info = aligned
            horns, brain_mask = warped[0], warped[1]
            if skull_mask is not None:
                skull_mask = warped[2]
            measure_spacing = atlas_spacing
            rot_deg = float(atlas_info["rotation_deg"][2])
    if atlas_info is None:
        # index-space rotation shears physical shapes when in-plane
        # spacing is anisotropic — only align (and trust diameter *
        # spacing[0]) when the axial pixels are square to ~2%
        iso_inplane = abs(spacing[0] - spacing[1]) <= 0.02 * max(
            spacing[0], spacing[1])
        rot_deg = inplane_rotation_deg(brain_mask, spacing) \
            if iso_inplane else 0.0
        if abs(rot_deg) > 1.0:  # measure in the head-aligned frame
            rotated = _rotate_masks_inplane(
                -rot_deg, horns, brain_mask,
                *([skull_mask] if skull_mask is not None else []))
            horns, brain_mask = rotated[0], rotated[1]
            if skull_mask is not None:
                skull_mask = rotated[2]
    # diameters measure the inner-skull cavity in the aligned frame
    # (`:246-266`: dilate 2 → remove skull → largest blob → small-blob
    # filters → max_diameter_x at the horn slice)
    cavity = inner_skull_cavity(brain_mask, skull_mask)
    from boa_tpu.ops.connected_components import filter_components_by_size

    # reference removes blobs < 200 / < 10 voxels in its 1 mm atlas space
    # (= mm^3); convert to this grid's voxel volume. interval is (lo, hi]
    vox_mm3 = atlas_spacing ** 3 if atlas_info is not None \
        else float(np.prod(spacing))
    cavity = filter_components_by_size(
        cavity, (200.0 / vox_mm3 - 1, 1e10)).astype(bool)
    horns = filter_components_by_size(
        horns, (10.0 / vox_mm3 - 1, 1e10)).astype(bool)
    if not horns.any() or not cavity.any():
        return {"success": False,
                "reason": "empty masks after postprocessing"}
    d_v, (start_v, end_v) = max_diameter_x(horns)
    z = start_v[2]
    # brain diameter on the same slice (reference measures at horn slice)
    d_b, (start_b, end_b) = max_diameter_x(cavity[:, :, z:z + 1])
    start_b[2] = end_b[2] = z
    if d_b == 0:
        return {"success": False, "reason": "no brain on horn slice"}
    ei = d_v / d_b
    result = {
        "success": True,
        "evans_index": round(float(ei), 4),
        "ventricle_diameter_mm": round(d_v * measure_spacing, 2),
        "brain_diameter_mm": round(d_b * measure_spacing, 2),
        "ventricle_volume_ml": round(vent_vol, 1),
        "brain_volume_ml": round(brain_vol, 1),
        "ventricle_brain_ratio": round(vent_vol / max(brain_vol, 1e-6), 4),
        "slice": int(z),
        "inplane_rotation_deg": round(rot_deg, 2),
    }
    if atlas_info is not None:
        result["atlas_registration"] = atlas_info
    if plot_file is not None:
        _plot(cavity, start_b, end_b, start_v, end_v, result, plot_file)
    return result


def _plot(brain, start_b, end_b, start_v, end_v, result, out) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    z = start_v[2]
    sl = brain[:, :, z].T
    plt.figure(figsize=(8, 9))
    plt.imshow(sl, cmap="gray", origin="lower", interpolation="gaussian")
    plt.plot([start_b[0], end_b[0]], [start_b[1], end_b[1]], "-g", lw=3)
    plt.plot([start_v[0], end_v[0]], [start_v[1], end_v[1]], "-g", lw=3)
    plt.scatter([start_b[0], end_b[0], start_v[0], end_v[0]],
                [start_b[1], end_b[1], start_v[1], end_v[1]],
                color="red", marker="x", s=200)
    plt.title(f"EVANS INDEX: {result['evans_index']:.3f}\n"
              f"brain volume: {result['brain_volume_ml']:.1f}ml\n"
              f"ventricle volume: {result['ventricle_volume_ml']:.1f}ml\n"
              f"ventricle/brain ratio: {result['ventricle_brain_ratio']:.3f}")
    plt.axis("off")
    plt.gca().invert_xaxis()
    plt.savefig(out, dpi=200, bbox_inches="tight")
    plt.close()


def main(argv=None) -> None:
    import argparse

    from boa_tpu.inference.pipeline import predict_image
    from boa_tpu.io import nifti
    from boa_tpu.weights.store import ModelStore

    ap = argparse.ArgumentParser("totalseg_evans_index")
    ap.add_argument("-i", "--input", type=Path, required=True)
    ap.add_argument("-o", "--output", type=Path, default=None)
    ap.add_argument("-p", "--plot", type=Path, default=None)
    args = ap.parse_args(argv)
    img = nifti.load(args.input)
    store = ModelStore()
    vent = predict_image(img, "ventricle_parts", store)
    total = predict_image(img, "total", store, fast=True)
    inv = {v: k for k, v in total.label_map.items()}
    brain = np.asarray(total.seg.data) == inv.get("brain", -1)
    skull = np.asarray(total.seg.data) == inv.get("skull", -1)
    res = evans_index(np.asarray(vent.seg.data), vent.label_map, brain,
                      img.zooms, plot_file=args.plot,
                      ct=np.asarray(img.data),
                      skull_mask=skull if skull.any() else None)
    print(json.dumps(res, indent=2))
    if args.output:
        args.output.write_text(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
