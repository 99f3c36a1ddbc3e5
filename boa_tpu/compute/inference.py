"""Model-run driver: iterate requested models over one CT study.

Parity: `body_organ_analysis/compute/inference.py:50-144`
`compute_all_models` — TotalSegmentator tasks via the TS-level pipeline,
BASE_MODELS (bca, body_regions, body_parts) via the BCA path,
skip-if-exists caching, crop-cascade pre-pass for the additional models,
and the measurements JSON.

TPU design difference: the CT is decoded ONCE into a NiftiImage and the
same in-memory volume feeds every model (the reference re-reads the NIfTI
from disk per model); the z-split force_split decision disappears because
volumes stay device-resident (SURVEY.md §5 long-context analogue).
"""

from __future__ import annotations

import json
import time as _time
import logging
import pathlib
from typing import Any, Iterable

import numpy as np

from boa_tpu.bca.pipeline import bca_inference, run_pipeline
from boa_tpu.inference.pipeline import predict_image
from boa_tpu.io import nifti
from boa_tpu.measure.measurements import compute_measurements
from boa_tpu.utils.constants import BASE_MODELS
from boa_tpu.utils.misc import (ADDITIONAL_MODELS_OUTPUT_NAME,
                                convert_resampling_slices, np_json_default)
from boa_tpu.weights.store import ModelStore

logger = logging.getLogger(__name__)


def range_warning(ct_image_data: np.ndarray, img=None) -> tuple:
    from boa_tpu.ops.connected_components import minmax

    lo, hi = minmax(ct_image_data)
    if img is not None and img.data is ct_image_data:
        # cache for upload_ct's pack12 gating (ops/packing.py) — saves a
        # second full-volume min/max pass at upload time. Bound to the
        # data buffer's identity: io/nifti.py device_data only trusts it
        # while img.data is still this exact array (the pipeline replaces
        # img.data rather than mutating — same convention as the device
        # cache), so a later data swap can't serve a stale range into the
        # lossy-if-out-of-range pack12 path.
        object.__setattr__(img, "_hu_range", (ct_image_data, lo, hi))
    if lo < -1024 or hi > 3071:
        logger.warning(
            "Unexpected CT values found in input image: got %s-%s, expected "
            "-1024-3071. The values have been clipped to the expected range. "
            "Please check the segmentations to ensure that everything is "
            "correct.", lo, hi)
    return lo, hi


# tasks that run a cheap low-res `total` first and crop to specific organs
# (totalsegmentator/python_api.py:673-736 crop cascade)
_CROP_TASKS = {"lung_vessels", "cerebral_bleed", "hip_implant",
               "liver_vessels", "pleural_pericard_effusion",
               "heartchambers_highres", "coronary_arteries", "liver_segments"}


def _output_name(model: str) -> str:
    return ADDITIONAL_MODELS_OUTPUT_NAME.get(model, model)


def compute_all_models(
    ct_path: pathlib.Path,
    segmentation_folder: pathlib.Path,
    models_to_compute: Iterable[str] | str,
    totalsegmentator_params: dict[str, Any] | None = None,
    fast_bca: bool = False,
    bca_params: dict[str, Any] | None = None,
    force_split_threshold: int = 400,
    recompute: bool = True,
    cnr_adjustment: bool = True,
    store: ModelStore | None = None,
    fake_predict=None,
    worker=None,
    images_out: dict[str, Any] | None = None,
) -> dict[str, int]:
    """Returns per-study stats (voxel/slice counts), writes all artifacts.

    `worker` (utils/stages.HostWorker) defers pure-host stages — gzip
    saves, preview shading — behind the next device stage; every file
    this function promises is synced before it returns. `images_out`
    collects the in-memory seg NiftiImages (keyed by output name) so the
    caller's metrics passes skip gunzip reloads."""
    totalsegmentator_params = dict(totalsegmentator_params or {})
    bca_params = bca_params or {}
    with_preview = totalsegmentator_params.pop("preview", False)
    fast_total = totalsegmentator_params.pop("fast", False)
    license_number = totalsegmentator_params.pop("license_number", None)
    store = store or ModelStore()
    segmentation_folder = pathlib.Path(segmentation_folder)
    segmentation_folder.mkdir(parents=True, exist_ok=True)

    t_load = _time.perf_counter()
    ct_img = nifti.load(pathlib.Path(ct_path))
    if ct_img.data.ndim != 3:
        raise ValueError(f"Only 3D CT scans are supported not {ct_img.data.ndim}D.")
    logger.info("Input image:   %s", ct_path)
    logger.info("Image size:    %s", ct_img.shape)
    logger.info("Voxel spacing: %s", ct_img.zooms)
    range_warning(np.asarray(ct_img.data), img=ct_img)
    logger.info("CT load + range check in %.2fs",
                _time.perf_counter() - t_load)

    shape, spacing = ct_img.shape, ct_img.zooms
    # in-plane body crop before the first upload (ops/cropping.py:
    # body_crop_xy): the tunnel and the MXU both pay per voxel, and the
    # body typically covers <60% of a 512x512 FOV. Saved volumes are
    # padded back to the full grid, so on-disk outputs are unchanged.
    # Opt out with BOA_BODY_CROP=0.
    import os as _os

    if _os.environ.get("BOA_BODY_CROP", "1") != "0":
        from boa_tpu.ops.cropping import body_crop_xy

        t_crop = _time.perf_counter()
        ct_img, _crop = body_crop_xy(ct_img)
        logger.info("Body-crop detection in %.2fs",
                    _time.perf_counter() - t_crop)
        if _crop is not None:
            logger.info(
                "Body crop: x %d:%d y %d:%d (%.0f%% of the in-plane FOV)",
                _crop.x0, _crop.x1, _crop.y0, _crop.y1,
                100.0 * _crop.voxel_fraction)
    measurement_models = [m for m in models_to_compute if m not in BASE_MODELS]
    stats = {
        "num_voxels": int(shape[0]) * int(shape[1]) * int(shape[2]),
        "num_slices": int(shape[2]),
        "num_slices_resampled": convert_resampling_slices(
            slices=shape[-1], current_sampling=spacing[-1],
            target_resampling=1.5),
    }

    crop_total: nifti.NiftiImage | None = None  # cached low-res total for crops
    save_futures: list = []  # deferred seg saves; synced before return
    # in-memory seg images for the measurement engine: sharing the instance
    # also shares its cached device upload with the preview renderer
    seg_cache: dict[str, nifti.NiftiImage] = \
        images_out if images_out is not None else {}
    for chosen_task in measurement_models:
        logger.info("Computing model %s...", chosen_task)
        seg_file = segmentation_folder / f"{_output_name(chosen_task)}.nii.gz"
        if not recompute and seg_file.is_file():
            logger.info("The model was already computed, skipping...")
            continue

        crop_mask = None
        if chosen_task in _CROP_TASKS and fake_predict is None:
            from boa_tpu.tasks.registry import get_task

            task_cfg = get_task(chosen_task)
            if task_cfg.crop:
                if crop_total is None:
                    crop_res = predict_image(ct_img, "total", store, fast=True,
                                             fake_predict=fake_predict)
                    crop_total = crop_res.seg
                    crop_total.set_label_map(crop_res.label_map)
                inv = {v: k for k, v in crop_total.get_label_map().items()}
                labels = [inv[o] for o in task_cfg.crop if o in inv]
                mask = np.isin(np.asarray(crop_total.data), labels)
                crop_mask = nifti.NiftiImage(data=mask.astype(np.uint8),
                                             affine=crop_total.affine)

        t_model = _time.perf_counter()
        res = predict_image(
            ct_img, chosen_task, store,
            fast=fast_total if chosen_task == "total" else False,
            crop_mask=crop_mask,
            statistics=chosen_task == "total",
            fake_predict=fake_predict,
            # total's original-grid seg feeds the preview depth pass and
            # the measurement engine on device: keeping the pipeline's
            # device copy saves re-uploading a full-grid 117-label volume
            # (not 4-bit packable; ~150 MB through the tunnel at 600
            # slices). On the full-res path the copy is free (the back-
            # resample already ran on device).
            keep_device_seg=chosen_task == "total",
        )
        logger.info("Model %s predicted in %.2fs", chosen_task,
                    _time.perf_counter() - t_model)
        seg_cache[chosen_task] = res.seg
        if res.seg_dev_full is not None:
            # seed the NiftiImage device cache (identity-keyed tuple,
            # io/nifti.py device_data) so preview/measurements reuse it
            object.__setattr__(res.seg, "_device_data",
                               (res.seg.data, res.seg_dev_full))
        if worker is not None:
            save_futures.append(worker.submit(
                f"save-{seg_file.name}", nifti.save, res.seg, seg_file))
        else:
            t_model = _time.perf_counter()
            nifti.save(res.seg, seg_file)
            logger.info("Saved %s in %.2fs", seg_file.name,
                        _time.perf_counter() - t_model)
        if res.stats is not None:
            with (segmentation_folder / f"{chosen_task}-statistics.json"
                  ).open("w") as f:
                json.dump(res.stats, f, indent=2, default=np_json_default)
        if with_preview and chosen_task == "total":
            try:
                from boa_tpu.compute.preview import generate_preview

                t_prev = _time.perf_counter()
                generate_preview(ct_img, res.seg, res.label_map,
                                 segmentation_folder / "preview_total.png",
                                 worker=worker)
                logger.info("Preview rendered in %.2fs%s",
                            _time.perf_counter() - t_prev,
                            " (depth pass; render deferred)"
                            if worker is not None else "")
            except Exception:
                logger.warning("Preview generation failed", exc_info=True)

    measurement_file = segmentation_folder / "total-measurements.json"
    if measurement_models and (recompute or not measurement_file.is_file()):
        t_meas = _time.perf_counter()
        json_data = compute_measurements(
            ct_path=pathlib.Path(ct_path),
            segmentation_folder=segmentation_folder,
            models=measurement_models,
            cnr_adjustment=cnr_adjustment,
            ct_image=ct_img,
            seg_images=seg_cache,
            worker=worker,
        )
        with measurement_file.open("w") as ofile:
            json.dump(json_data, ofile, indent=2, default=np_json_default)
        del json_data
        logger.info("Measurements computed in %.2fs",
                    _time.perf_counter() - t_meas)
    else:
        logger.info("The total measurements were already computed, skipping...")

    boa_models_to_compute = BASE_MODELS & set(models_to_compute)
    for boa_task in sorted(boa_models_to_compute):
        resampling_bca = convert_resampling_slices(
            slices=shape[-1], current_sampling=spacing[-1],
            target_resampling=5.0)
        if resampling_bca > force_split_threshold:
            # informational only: the device pipeline needs no z-split
            logger.info("Study resamples to %s slices (> %s); the reference "
                        "would z-split here, the device pipeline does not.",
                        resampling_bca, force_split_threshold)
        if boa_task == "bca":
            run_pipeline(
                input_image=ct_img,
                output_dir=segmentation_folder,
                store=store,
                fast_bca=fast_bca,
                recompute=recompute,
                fake_predict=fake_predict,
                total_seg=np.asarray(seg_cache["total"].data)
                if "total" in seg_cache else None,
                worker=worker,
                stats_out=stats,
                images_out=images_out,
                **bca_params,
            )
        else:
            bca_inference(ct_img, segmentation_folder, boa_task, store,
                          fast_bca, recompute=recompute,
                          fake_predict=fake_predict)
    # file contract: everything this function promised is on disk (the
    # preview render / report PDF may still be in flight on the worker)
    for fut in save_futures:
        fut.result()
    return stats
