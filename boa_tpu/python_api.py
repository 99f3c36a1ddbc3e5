"""Drop-in `totalsegmentator()`-style public API.

Parity: `totalsegmentator/python_api.py:96-822` — the library entry point a
reference user calls directly. File/NiftiImage in, segmentation out, with
the familiar knobs (task, fast/fastest, ml, statistics, radiomics,
roi_subset, preview, crop cascade handled internally, license gating).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

from boa_tpu.io import nifti
from boa_tpu.io.nifti import NiftiImage
from boa_tpu.tasks.registry import BCA_TASKS, TASKS, get_task
from boa_tpu.weights.store import ModelStore

logger = logging.getLogger(__name__)


def show_license_info() -> None:
    """`python_api.py:75-93`: explain how license-gated models unlock."""
    from boa_tpu.utils.persistent_config import get_license_number

    if not get_license_number():
        print(
            "This model is only available for licensed users. Set your "
            "license with: python -c \"from boa_tpu.utils.persistent_config "
            "import set_license_number; set_license_number('aca_...')\"")
        raise SystemExit(1)


def totalsegmentator(
    input: str | Path | NiftiImage,  # noqa: A002 (reference signature)
    output: str | Path | None = None,
    ml: bool = True,
    task: str = "total",
    fast: bool = False,
    fastest: bool = False,
    roi_subset: list[str] | None = None,
    statistics: bool = False,
    radiomics: bool = False,
    preview: bool = False,
    device: str = "tpu",
    quiet: bool = False,
    license_number: str | None = None,
    fake_predict=None,
    store: ModelStore | None = None,
    stats_aggregation: str = "mean",
    statistics_exclude_masks_at_border: bool = True,
    nr_thr_resamp: int = 1,   # accepted for API parity (device-side here)
    nr_thr_saving: int = 6,
):
    """Segment a CT volume; returns the multilabel NiftiImage (and the
    statistics dict when `statistics`).

    Mirrors the reference defaults: `total` task, crop-cascade pre-pass for
    organ-cropped tasks, `ml=True` writes one multilabel file; `ml=False`
    writes one binary mask per class into the output directory
    (`nnunet.py:728-803` per-class save path).
    """
    cfg = get_task(task, fast=fast) if not fastest else \
        get_task(f"{task}_fastest" if f"{task}_fastest" in TASKS else task)
    if cfg.license_required and not license_number:
        show_license_info()

    from boa_tpu.inference.pipeline import predict_image

    img = input if isinstance(input, NiftiImage) else nifti.load(Path(input))
    store = store or ModelStore()

    crop_mask = None
    if cfg.crop and fake_predict is None:
        crop_task = cfg.crop_model if cfg.crop_model != "total" else "total"
        if not quiet:
            logger.info("Crop cascade: running fast %s for organ crop",
                        crop_task)
        rough = predict_image(img, crop_task, store,
                              fast=crop_task == "total")
        inv = {v: k for k, v in rough.label_map.items()}
        labels = [inv[o] for o in cfg.crop if o in inv]
        mask = np.isin(np.asarray(rough.seg.data), labels).astype(np.uint8)
        crop_mask = NiftiImage(data=mask, affine=rough.seg.affine)

    res = predict_image(
        img, task if not fastest else f"{task}_fastest", store,
        fast=fast, crop_mask=crop_mask, statistics=statistics,
        fake_predict=fake_predict)

    seg_img = res.seg
    label_map = dict(res.label_map)
    if roi_subset is not None:
        keep = {k for k, v in label_map.items() if v in roi_subset}
        data = np.asarray(seg_img.data)
        data = np.where(np.isin(data, list(keep)), data, 0).astype(data.dtype)
        seg_img = NiftiImage(data=data, affine=seg_img.affine.copy())
        seg_img.set_label_map(label_map)

    if output is not None:
        output = Path(output)
        if ml:
            nifti.save(seg_img, output)
        else:  # one binary mask per class (per-class save path)
            output.mkdir(parents=True, exist_ok=True)
            data = np.asarray(seg_img.data)
            for lb, name in label_map.items():
                if roi_subset is not None and name not in roi_subset:
                    continue
                m = NiftiImage(data=(data == lb).astype(np.uint8),
                               affine=seg_img.affine.copy())
                nifti.save(m, output / f"{name}.nii.gz")
        if statistics and res.stats is not None:
            stats_path = (output.parent if ml else output) / "statistics.json"
            from boa_tpu.utils.misc import np_json_default

            stats_path.write_text(json.dumps(res.stats, indent=2,
                                             default=np_json_default))
        if radiomics:
            from boa_tpu.measure.radiomics import get_radiomics_features

            rad = get_radiomics_features(np.asarray(img.data),
                                         np.asarray(seg_img.data),
                                         img.zooms, label_map)
            rad_path = (output.parent if ml else output) / \
                "statistics_radiomics.json"
            rad_path.write_text(json.dumps(rad, indent=2))
        if preview:
            from boa_tpu.compute.preview import generate_preview

            generate_preview(img, seg_img, label_map,
                             (output.parent if ml else output)
                             / "preview_total.png")

    if statistics:
        return seg_img, res.stats
    return seg_img
