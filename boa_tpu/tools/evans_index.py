"""Evans index from ventricle + brain/skull segmentations.

Parity: `totalsegmentator/bin/totalseg_evans_index.py` — Evans index =
(max transverse diameter of the frontal horns) / (max inner-skull
transverse diameter), measured on the slice of the maximal horn diameter
(`max_diameter_x:55-79`), plus ventricle/brain volumes and a rendered
overview image. The reference aligns the head with an ANTs atlas
registration first; here the measurement runs in native axial space
(valid for the axial CTs BOA gates on) — documented deviation.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

FRONTAL_HORN_LABELS = ("frontal_horn_left", "frontal_horn_right")


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


def evans_index(ventricle_seg: np.ndarray,
                ventricle_label_map: dict[int, str],
                brain_mask: np.ndarray,
                spacing, plot_file: str | Path | None = None) -> dict:
    inv = {v: k for k, v in ventricle_label_map.items()}
    horns = np.isin(ventricle_seg,
                    [inv[n] for n in FRONTAL_HORN_LABELS if n in inv])
    if not horns.any() or not brain_mask.any():
        return {"success": False,
                "reason": "empty ventricle or brain segmentation"}
    d_v, (start_v, end_v) = max_diameter_x(horns)
    z = start_v[2]
    # brain diameter on the same slice (reference measures at horn slice)
    d_b, (start_b, end_b) = max_diameter_x(brain_mask[:, :, z:z + 1])
    start_b[2] = end_b[2] = z
    if d_b == 0:
        return {"success": False, "reason": "no brain on horn slice"}
    ml_per_voxel = float(np.prod(spacing)) / 1000.0
    vent_vol = float((ventricle_seg > 0).sum()) * ml_per_voxel
    brain_vol = float(brain_mask.sum()) * ml_per_voxel
    ei = d_v / d_b
    result = {
        "success": True,
        "evans_index": round(float(ei), 4),
        "ventricle_diameter_mm": round(d_v * float(spacing[0]), 2),
        "brain_diameter_mm": round(d_b * float(spacing[0]), 2),
        "ventricle_volume_ml": round(vent_vol, 1),
        "brain_volume_ml": round(brain_vol, 1),
        "ventricle_brain_ratio": round(vent_vol / max(brain_vol, 1e-6), 4),
        "slice": int(z),
    }
    if plot_file is not None:
        _plot(brain_mask, start_b, end_b, start_v, end_v, result, plot_file)
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
    res = evans_index(np.asarray(vent.seg.data), vent.label_map, brain,
                      img.zooms, plot_file=args.plot)
    print(json.dumps(res, indent=2))
    if args.output:
        args.output.write_text(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
