"""BCA end-to-end pipeline.

Parity: `body_composition_analysis/commands.py:84-170` `run_pipeline` —
body_parts inference (task 543) -> body_regions inference (task 542) ->
tissue subclassification -> examined-body-part detection -> per-vertebra
slice windows from `total` -> report build -> report.pdf /
bca-measurements.json / vertebrae.json. Inference wrapper parity:
`infer/infer.py:39-89` (skip-if-exists caching, per-task postprocessing).
"""

from __future__ import annotations

import json
import logging
import time as _time
from pathlib import Path
from typing import Any, Callable

import numpy as np

from boa_tpu.bca import postprocess as bca_pp
from boa_tpu.bca.report import AggregatableBodyPart, Builder, create_vertebrae_info
from boa_tpu.bca.tissues import subclassify_tissues
from boa_tpu.inference.pipeline import predict_image
from boa_tpu.io import nifti
from boa_tpu.tasks import class_maps
from boa_tpu.weights.store import ModelStore

logger = logging.getLogger(__name__)


def bca_inference(
    ct_img: nifti.NiftiImage,
    output_dir: Path,
    task_name: str,
    store: ModelStore,
    fast_bca: bool = False,
    recompute: bool = False,
    compute_dtype: str = "bfloat16",
    fake_predict: Callable | None = None,
) -> nifti.NiftiImage:
    """Run one BCA model incl. its postprocessing; cached on disk."""
    output_file = Path(output_dir) / f"{task_name}.nii.gz"
    if not recompute and output_file.is_file():
        logger.info("Loading already computed %s...", task_name)
        return nifti.load(output_file)
    t0 = _time.perf_counter()
    res = predict_image(ct_img, task_name, store, fast=fast_bca,
                        compute_dtype=compute_dtype, fake_predict=fake_predict)
    logger.info("BCA %s predicted in %.2fs", task_name,
                _time.perf_counter() - t0)
    t0 = _time.perf_counter()
    seg = np.asarray(res.seg.data, dtype=np.uint8)
    if task_name == "body_parts":
        seg = bca_pp.postprocess_part_segmentation(seg)
    elif task_name == "body_regions":
        seg = bca_pp.postprocess_region_segmentation(seg)
    logger.info("BCA %s postprocessed in %.2fs", task_name,
                _time.perf_counter() - t0)
    out = nifti.NiftiImage(data=seg, affine=res.seg.affine)
    out.set_label_map(res.label_map)
    t0 = _time.perf_counter()
    nifti.save(out, output_file)
    logger.info("BCA %s saved in %.2fs", task_name,
                _time.perf_counter() - t0)
    return out


def run_pipeline(
    input_image: Path | nifti.NiftiImage,
    output_dir: Path,
    store: ModelStore | None = None,
    fast_bca: bool = False,
    examined_body_region: str | None = None,
    median_filtering: bool = False,
    save_pdf: bool = True,
    recompute: bool = True,
    theme: str = "light",
    compute_dtype: str = "bfloat16",
    fake_predict: Callable | None = None,
    total_seg: np.ndarray | None = None,
) -> dict[str, Any]:
    """Returns the bca-measurements dict (also written to disk)."""
    output_dir = Path(output_dir)
    output_dir.mkdir(exist_ok=True, parents=True)
    store = store or ModelStore()
    ct_img = (input_image if isinstance(input_image, nifti.NiftiImage)
              else nifti.load(input_image))

    body_parts_img = bca_inference(ct_img, output_dir, "body_parts", store,
                                   fast_bca, recompute=recompute,
                                   compute_dtype=compute_dtype,
                                   fake_predict=fake_predict)
    body_regions_img = bca_inference(ct_img, output_dir, "body_regions", store,
                                     fast_bca, recompute=recompute,
                                     compute_dtype=compute_dtype,
                                     fake_predict=fake_predict)

    t0 = _time.perf_counter()
    regions = np.asarray(body_regions_img.data)
    # device_data: the CT upload is cached on the image instance
    tissues, tissues_dev, regions_dev = subclassify_tissues(
        ct_img.device_data(), regions, median_filtering=median_filtering,
        return_device=True)
    logger.info("Tissues subclassified in %.2fs", _time.perf_counter() - t0)
    tis_img = nifti.NiftiImage(data=tissues, affine=body_regions_img.affine)
    tis_img.set_label_map({int(k): v for v, k in
                           class_maps.bca_tissues().items()})
    t0 = _time.perf_counter()
    nifti.save(tis_img, output_dir / "tissues.nii.gz")

    # total segmentation + measurements (produced by the BOA orchestrator);
    # the in-memory seg from the orchestrator skips a 78 MB gunzip reload
    total_path = output_dir / "total.nii.gz"
    if total_seg is None and total_path.exists():
        total_seg = np.asarray(nifti.load(total_path).data)
    tm_path = output_dir / "total-measurements.json"
    total_measurements = json.loads(tm_path.read_text()) if tm_path.exists() else None
    logger.info("BCA tissues save + total reload in %.2fs",
                _time.perf_counter() - t0)

    t0 = _time.perf_counter()
    spacing = ct_img.zooms
    builder = Builder(ct_img.device_data(), np.asarray(body_parts_img.data),
                      regions, tissues, spacing, theme,
                      tissues_dev=tissues_dev, regions_dev=regions_dev)
    logger.info("BCA builder init in %.2fs", _time.perf_counter() - t0)
    if examined_body_region:
        body_part = AggregatableBodyPart[examined_body_region.upper()]
    else:
        body_part = AggregatableBodyPart.from_body_regions(
            regions, spacing[2], z_counts=builder.region_z_counts())
        if body_part == AggregatableBodyPart.NONE:
            logger.warning("No supported body part detected")
    builder.examined_body_part = body_part

    vertebrae_info = None
    if total_seg is not None:
        vertebrae_info = create_vertebrae_info(
            total_seg, body_part, class_maps.get_class_map("total"))

    t0 = _time.perf_counter()
    prepared = builder.prepare(vertebrae_info, total=total_seg,
                               total_measurements=total_measurements)
    logger.info("BCA report prepared in %.2fs", _time.perf_counter() - t0)
    t0 = _time.perf_counter()
    if save_pdf:
        (output_dir / "report.pdf").write_bytes(builder.create_pdf(**prepared))
        logger.info("BCA PDF rendered in %.2fs", _time.perf_counter() - t0)
    t0 = _time.perf_counter()
    json_data = builder.create_json(**prepared)

    if vertebrae_info:
        (output_dir / "vertebrae.json").write_text(
            json.dumps(vertebrae_info, indent=2))
    (output_dir / "bca-measurements.json").write_text(
        json.dumps(json_data, indent=2))
    logger.info("BCA json in %.2fs", _time.perf_counter() - t0)
    return json_data
