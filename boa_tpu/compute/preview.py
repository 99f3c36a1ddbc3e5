"""Segmentation preview montage.

Parity: `totalsegmentator/preview.py:308-366` — the reference renders a
smoothed-3D-contour montage of ROI groups over a sagittal CT slab using
fury/VTK under Xvfb. Here the same montage (one panel per ROI group, CT
sagittal MIP slab underneath, colored label projections on top) is drawn
with matplotlib — no GPU/X server dependency, runs in any worker.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

# ROI grouping mirrors preview.py's subject plots: organs / vertebrae /
# cardiac+vessels / muscles / ribs
ROI_GROUPS = {
    "organs": ["spleen", "kidney_right", "kidney_left", "liver", "stomach",
               "pancreas", "lung_upper_lobe_left", "lung_lower_lobe_left",
               "lung_upper_lobe_right", "lung_middle_lobe_right",
               "lung_lower_lobe_right", "esophagus", "trachea", "thyroid_gland",
               "small_bowel", "duodenum", "colon", "urinary_bladder",
               "gallbladder", "adrenal_gland_right", "adrenal_gland_left"],
    "vertebrae": [f"vertebrae_{v}" for v in
                  ["C1", "C2", "C3", "C4", "C5", "C6", "C7",
                   "T1", "T2", "T3", "T4", "T5", "T6", "T7", "T8", "T9",
                   "T10", "T11", "T12",
                   "L1", "L2", "L3", "L4", "L5", "S1"]] + ["sacrum"],
    "cardiac": ["heart", "aorta", "pulmonary_vein", "brachiocephalic_trunk",
                "subclavian_artery_right", "subclavian_artery_left",
                "common_carotid_artery_right", "common_carotid_artery_left",
                "brachiocephalic_vein_left", "brachiocephalic_vein_right",
                "atrial_appendage_left", "superior_vena_cava",
                "inferior_vena_cava", "portal_vein_and_splenic_vein",
                "iliac_artery_left", "iliac_artery_right",
                "iliac_vena_left", "iliac_vena_right"],
    "muscles": ["humerus_left", "humerus_right", "scapula_left", "scapula_right",
                "clavicula_left", "clavicula_right", "femur_left", "femur_right",
                "hip_left", "hip_right", "spinal_cord",
                "gluteus_maximus_left", "gluteus_maximus_right",
                "gluteus_medius_left", "gluteus_medius_right",
                "gluteus_minimus_left", "gluteus_minimus_right",
                "autochthon_left", "autochthon_right",
                "iliopsoas_left", "iliopsoas_right", "brain", "skull"],
    "ribs": [f"rib_{s}_{i}" for s in ("left", "right") for i in range(1, 13)]
            + ["sternum", "costal_cartilages"],
}


def _label_projections(seg: np.ndarray, n_labels: int) -> np.ndarray:
    """(y, z, label) presence of every label projected along x, in ONE
    combined-key bincount pass (a per-label `seg == l` scan costs a full
    78M-voxel read each — 117 labels made the montage the slowest host
    stage after the model itself)."""
    _, ny, nz = seg.shape
    # out-of-map labels (e.g. the 255 ignore value) must not overflow into
    # the next (y,z) bucket
    width = max(n_labels, int(seg.max()) + 1)
    dt = np.int32 if ny * nz * width < 2 ** 31 else np.int64
    yz = np.arange(ny * nz, dtype=dt).reshape(ny, nz)
    combined = (yz[None] * dt(width) + seg.astype(dt)).ravel()
    counts = np.bincount(combined, minlength=ny * nz * width)
    return counts.reshape(ny, nz, width)[:, :, :n_labels] > 0


def _label_projections_device(seg_dev, n_labels: int) -> np.ndarray:
    """Device variant: the seg is already resident (shared upload with
    the measurement engine); only the (ny, nz, labels) presence bitmap
    crosses the link (~2 MB vs a 78M-voxel host pass)."""
    import jax
    import jax.numpy as jnp

    _, ny, nz = seg_dev.shape
    width = max(n_labels, int(jnp.max(seg_dev)) + 1)

    @jax.jit
    def proj(seg):
        yz = jnp.arange(ny * nz, dtype=jnp.int32).reshape(1, ny, nz)
        combined = (yz * width + seg.astype(jnp.int32)).ravel()
        counts = jax.ops.segment_sum(
            jnp.ones_like(combined, jnp.int32), combined,
            num_segments=ny * nz * width)
        return counts.reshape(ny, nz, width) > 0

    return np.asarray(proj(seg_dev))[:, :, :n_labels]


def generate_preview(ct_img, seg_img, label_map: dict[int, str],
                     out_path: str | Path, aspect: float | None = None) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import colormaps

    ct = np.asarray(ct_img.data)
    seg = np.asarray(seg_img.data)
    if seg.shape != ct.shape:
        ct = None  # differently-gridded fallback: skip the CT underlay
    inv = {v: k for k, v in label_map.items()}
    if aspect is None:
        zooms = getattr(ct_img, "zooms", (1.0, 1.0, 1.0))
        aspect = zooms[2] / zooms[1]

    n_labels = int(max(inv.values(), default=0)) + 1
    if hasattr(seg_img, "device_data"):
        try:
            projections = _label_projections_device(seg_img.device_data(),
                                                    n_labels)
        except Exception:
            logger.debug("device projection failed; host fallback",
                         exc_info=True)
            projections = _label_projections(seg, n_labels)
    else:
        projections = _label_projections(seg, n_labels)

    n = len(ROI_GROUPS)
    fig, axes = plt.subplots(1, n, figsize=(3.2 * n, 6), facecolor="black")
    for ax, (group, rois) in zip(np.atleast_1d(axes), ROI_GROUPS.items()):
        ax.set_facecolor("black")
        if ct is not None:
            mid = ct.shape[0] // 2
            slab = ct[max(0, mid - 10):mid + 10].max(axis=0)
            ax.imshow(np.clip(slab, -200, 500).T, cmap="gray",
                      origin="lower", aspect=aspect)
        cmap = colormaps["turbo"]
        labels = [inv[r] for r in rois if r in inv]
        # compose ONE overlay per group instead of an imshow layer per label
        overlay = np.zeros(projections.shape[:2][::-1] + (4,))
        for i, label in enumerate(labels):
            proj = projections[:, :, label].T
            if not proj.any():
                continue
            color = cmap(i / max(len(labels) - 1, 1))
            overlay[proj] = (*color[:3], 0.85)
        if overlay[..., 3].any():
            ax.imshow(overlay, origin="lower", aspect=aspect)
        ax.set_title(group, color="white", fontsize=11)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_path, dpi=110, facecolor="black")
    plt.close(fig)
    logger.info("Preview saved to %s", out_path)
