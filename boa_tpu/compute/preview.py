"""Segmentation preview montage: shaded 3-D surface panels per ROI group.

Parity: `totalsegmentator/preview.py:308-366` + `vtk_utils.py:72` — the
reference renders smoothed 3D organ contours over a sagittal CT slab
with fury/VTK under Xvfb. Here the same montage is produced without a
GPU/X dependency: per-label FIRST-HIT DEPTH maps along the sagittal ray
(one device segment-min pass over the resident segmentation) are turned
into Lambert-shaded surfaces (normals from the smoothed depth field),
composited per ROI group over the CT slab with matplotlib.
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

_FAR = np.int32(2 ** 30)  # "no surface along this ray"


def _label_depths(seg: np.ndarray, n_labels: int) -> np.ndarray:
    """(y, z, label) first-hit x index of every label along the sagittal
    ray, _FAR where absent — one combined-key scatter-min pass (a
    per-label scan costs a full 78M-voxel read each)."""
    nx, ny, nz = seg.shape
    width = max(n_labels, int(seg.max()) + 1)
    dt = np.int32 if ny * nz * width < 2 ** 31 else np.int64
    depth = np.full(ny * nz * width, _FAR, np.int32)
    yz = np.arange(ny * nz, dtype=dt).reshape(ny, nz)
    keys = (yz[None] * dt(width) + seg.astype(dt)).ravel()
    xvals = np.broadcast_to(
        np.arange(nx, dtype=np.int32)[:, None, None], seg.shape).ravel()
    np.minimum.at(depth, keys, xvals)
    return depth.reshape(ny, nz, width)[:, :, :n_labels]


_FAR16 = np.int16(32000)  # int16 "no hit" sentinel for the device maps


def _group_fronts_from_depths(depths: np.ndarray, inv: dict[str, int]
                              ) -> dict[str, tuple | None]:
    """Host fallback: per-group (front float32 — inf where no hit,
    which uint8 into the group's label list, labels) from the full
    per-label depth stack."""
    out: dict[str, tuple | None] = {}
    for group, rois in ROI_GROUPS.items():
        labels = [inv[r] for r in rois if r in inv]
        if not labels:
            out[group] = None
            continue
        stack = depths[:, :, labels].astype(np.float32)
        front = stack.min(axis=2)
        which = stack.argmin(axis=2).astype(np.uint8)
        front[front >= float(_FAR)] = np.inf
        out[group] = (front, which, labels)
    return out


def _fronts_jit():
    """Module-level jit (one retrace per seg shape, not per call — a
    per-call inner def would re-trace and remote-recompile every study)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    BIG = np.int32(2 ** 24)  # "not in this group" encoding sentinel

    @partial(jax.jit, static_argnames=("groups",))
    def fronts(seg, groups):
        """First-hit per group via min over x of (x*256 + rank): the
        smallest x wins and carries its label rank in the low byte. The
        per-group label match is a chain of compare-selects XLA fuses
        into one volume pass — no scatter-min over ny*nz*width segments
        (TPU scatters serialize) and no gather. Outputs stack into one
        int16 + one uint8 download."""
        nx = seg.shape[0]
        segi = seg.astype(jnp.int32)
        x_enc = (jnp.arange(nx, dtype=jnp.int32) * 256)[:, None, None]
        fr, wh = [], []
        for labels in groups:
            acc = jnp.full(segi.shape, BIG, jnp.int32)
            for rank, lb in enumerate(labels):
                acc = jnp.where(segi == lb, x_enc + rank, acc)
            front_enc = jnp.min(acc, axis=0)           # (y, z)
            fr.append(jnp.where(front_enc < BIG, front_enc >> 8,
                                jnp.int32(_FAR16)).astype(jnp.int16))
            wh.append((front_enc & 255).astype(jnp.uint8))
        return jnp.stack(fr), jnp.stack(wh)

    return fronts


_FRONTS = None


def _group_fronts_device(seg_dev, inv: dict[str, int], n_labels: int
                         ) -> dict[str, tuple | None]:
    """Per-group front-surface maps, reduced ON DEVICE: the (ny, nz,
    width) label-depth stack never leaves the chip — only one int16
    depth + uint8 argmin map per ROI group crosses the link (~0.5 MB a
    group vs 72 MB for the full stack at 118 labels)."""
    global _FRONTS
    if _FRONTS is None:
        _FRONTS = _fronts_jit()

    from boa_tpu.utils.timing import Spans

    spans = Spans("preview.fronts")
    group_labels = {g: tuple(inv[r] for r in rois if r in inv)
                    for g, rois in ROI_GROUPS.items()}
    groups = tuple(v for v in group_labels.values() if v)
    fr_dev, wh_dev = _FRONTS(seg_dev, groups)
    spans.mark("dispatch")
    spans.mark("exec", sync=fr_dev)
    fr_all = np.asarray(fr_dev).astype(np.float32)
    spans.mark("download_fr")
    wh_all = np.asarray(wh_dev)
    spans.mark("download_wh")
    out: dict[str, tuple | None] = {}
    gi = 0
    for group, labels in group_labels.items():
        if not labels:
            out[group] = None
            continue
        front = fr_all[gi].copy()
        front[front >= float(_FAR16)] = np.inf
        out[group] = (front, wh_all[gi], list(labels))
        gi += 1
    return out


def _shade_group(front: np.ndarray, which: np.ndarray,
                 colors: np.ndarray, aspect: float) -> np.ndarray:
    """RGBA overlay for one group from its front-surface map.

    `front` is (y, z) float32 (inf = no surface on this ray); `which`
    picks the group color; Lambert shading from the smoothed depth
    field's normals plus a depth cue gives the 3-D look (stand-in for
    the reference's vtk smoothed-contour render)."""
    from scipy import ndimage as ndi

    hit = np.isfinite(front)
    overlay = np.zeros((front.shape[1], front.shape[0], 4), np.float32)
    if not hit.any():
        return overlay

    # smooth the depth field for stable normals (organ surfaces are
    # voxelized); absent pixels get behind-everything depth so borders
    # face outward
    d = np.where(hit, front, float(front[hit].max()) + 8.0)
    d_s = ndi.gaussian_filter(d, sigma=1.6)
    gy, gz = np.gradient(d_s)
    gz = gz / max(aspect, 1e-3)  # physical-aspect correction
    # surface normal of x = d(y,z): (-1, gy, gz) (towards the viewer)
    norm = np.sqrt(1.0 + gy * gy + gz * gz)
    light = np.array([-1.0, -0.35, 0.45])
    light = light / np.linalg.norm(light)
    lambert = (-light[0] - light[1] * gy - light[2] * gz) / norm
    shade = np.clip(lambert, 0.15, 1.0)
    # depth cue: deeper surfaces slightly darker
    dr = front[hit]
    lo, hi = float(dr.min()), float(np.percentile(dr, 95) + 1.0)
    cue = 1.0 - 0.3 * np.clip((front - lo) / max(hi - lo, 1.0), 0.0, 1.0)
    intensity = shade * cue

    rgb = colors[which]  # (y, z, 3)
    out = rgb * intensity[..., None]
    overlay[..., :3] = np.transpose(out, (1, 0, 2))
    overlay[..., 3] = np.where(hit, 0.95, 0.0).T
    return overlay


def generate_preview(ct_img, seg_img, label_map: dict[int, str],
                     out_path: str | Path, aspect: float | None = None,
                     worker=None) -> None:
    """Render the montage; with a `worker` (utils/stages.HostWorker) the
    matplotlib/shading phase is deferred to the background host thread —
    only the device depth pass runs on the calling thread."""
    ct = np.asarray(ct_img.data)
    seg = np.asarray(seg_img.data)
    if seg.shape != ct.shape:
        ct = None  # differently-gridded fallback: skip the CT underlay
    inv = {v: k for k, v in label_map.items()}
    if aspect is None:
        zooms = getattr(ct_img, "zooms", (1.0, 1.0, 1.0))
        aspect = zooms[2] / zooms[1]

    n_labels = int(max(inv.values(), default=0)) + 1
    group_fronts = None
    if hasattr(seg_img, "device_data"):
        try:
            from boa_tpu.utils.timing import Spans

            spans = Spans("preview")
            cache_hit = getattr(seg_img, "_device_data", None) is not None
            seg_dev = seg_img.device_data()
            spans.mark("seg_sync(hit)" if cache_hit else "seg_upload",
                       sync=seg_dev)
            group_fronts = _group_fronts_device(seg_dev, inv, n_labels)
            spans.mark("depth_pass")
        except Exception:
            logger.debug("device depth pass failed; host fallback",
                         exc_info=True)
    if group_fronts is None:
        group_fronts = _group_fronts_from_depths(
            _label_depths(seg, n_labels), inv)

    if worker is not None:
        worker.submit("preview-render", _render_montage, ct, group_fronts,
                      aspect, out_path, suppress=True)
    else:
        _render_montage(ct, group_fronts, aspect, out_path)


def _render_montage(ct: np.ndarray | None,
                    group_fronts: dict[str, tuple | None], aspect: float,
                    out_path: str | Path) -> None:
    """Pure-host phase: shading + matplotlib composite (no device calls)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import colormaps

    cmap = colormaps["turbo"]
    n = len(ROI_GROUPS)
    slab = None
    if ct is not None:
        # one sagittal MIP slab shared by every panel (recomputing it per
        # group costs 5 full slab passes on the single-core host)
        mid = ct.shape[0] // 2
        slab = np.clip(ct[max(0, mid - 10):mid + 10].max(axis=0),
                       -200, 500).T
    fig, axes = plt.subplots(1, n, figsize=(3.2 * n, 6), facecolor="black")
    for ax, group in zip(np.atleast_1d(axes), ROI_GROUPS):
        ax.set_facecolor("black")
        if slab is not None:
            ax.imshow(slab, cmap="gray", origin="lower", aspect=aspect)
        entry = group_fronts.get(group)
        if entry is not None:
            front, which, labels = entry
            colors = np.asarray([cmap(i / max(len(labels) - 1, 1))[:3]
                                 for i in range(len(labels))], np.float32)
            overlay = _shade_group(front, which, colors, aspect)
            if overlay[..., 3].any():
                ax.imshow(overlay, origin="lower", aspect=aspect)
        ax.set_title(group, color="white", fontsize=11)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_path, dpi=110, facecolor="black")
    plt.close(fig)
    logger.info("Preview saved to %s", out_path)
