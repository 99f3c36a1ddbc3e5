"""Small shared utilities.

Parity: `body_organ_analysis/compute/util.py` (ADDITIONAL_MODELS_OUTPUT_NAME,
convert_resampling_slices, create_mask, convert_name, to_png_data_url).
"""

from __future__ import annotations

import base64

import numpy as np

ADDITIONAL_MODELS_OUTPUT_NAME: dict[str, str] = {
    "lung_vessels": "lung_vessels_airways",
    "cerebral_bleed": "cerebral_bleed",
    "hip_implant": "hip_implant",
    "coronary_arteries": "coronary_arteries",
    "pleural_pericard_effusion": "pleural_pericard_effusion",
    "liver_vessels": "liver_vessels",
    "heartchambers_highres": "heartchambers",
}


def convert_resampling_slices(
    slices: int, current_sampling: float, target_resampling: float | None
) -> int:
    if target_resampling is None:
        return slices
    return round((slices / target_resampling) * current_sampling)


def create_mask(region_data: np.ndarray, labels) -> np.ndarray:
    if isinstance(labels, (int, np.integer)):
        return region_data == labels
    return np.isin(region_data, labels)


def convert_name(name: str) -> str:
    return "".join(s.capitalize() for s in name.split("_"))


def np_json_default(o):
    """json.dump default= handler for numpy scalars/arrays."""
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, (np.bool_,)):
        return bool(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"Object of type {o.__class__.__name__} "
                    f"is not JSON serializable")


def to_png_data_url(image: np.ndarray) -> str:
    """PNG-compress an RGB uint8 array and return it as an inline
    ``data:image/png;base64,…`` URL (for self-contained HTML reports)."""
    import cv2

    rgb = image if image.dtype == np.uint8 \
        else np.clip(image, 0, 255).astype(np.uint8)
    ok, buf = cv2.imencode(".png", rgb[..., ::-1])  # cv2 expects BGR
    if not ok:
        raise ValueError("PNG encoding failed")
    return "data:image/png;base64," + base64.b64encode(buf.tobytes()).decode()
