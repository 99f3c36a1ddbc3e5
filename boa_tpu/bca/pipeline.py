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
from concurrent.futures import Future
from pathlib import Path
from typing import Any, Callable

import numpy as np

from boa_tpu.bca import postprocess as bca_pp
from boa_tpu.bca.definitions import BodyRegion
from boa_tpu.bca.report import AggregatableBodyPart, Builder, create_vertebrae_info
from boa_tpu.bca.tissues import subclassify_tissues
from boa_tpu.inference.pipeline import predict_image
from boa_tpu.io import nifti
from boa_tpu.tasks import class_maps
from boa_tpu.weights.store import ModelStore

logger = logging.getLogger(__name__)


def _postprocess_bca_task(task_name: str, res, label_map) -> nifti.NiftiImage:
    """Per-task host postprocess of one BCA model's segmentation."""
    t0 = _time.perf_counter()
    seg = np.asarray(res.seg.data, dtype=np.uint8)
    if task_name == "body_parts":
        seg = bca_pp.postprocess_part_segmentation(seg)
    elif task_name == "body_regions":
        seg = bca_pp.postprocess_region_segmentation(seg)
    logger.info("BCA %s postprocessed in %.2fs", task_name,
                _time.perf_counter() - t0)
    out = nifti.NiftiImage(data=seg, affine=res.seg.affine,
                           crop_info=getattr(res.seg, "crop_info", None))
    out.set_label_map(label_map)
    if getattr(res, "seg_dev_full", None) is not None:
        # device twin of the PRE-postprocess seg: the tissue pass rebuilds
        # the postprocessed device copy from it plus a 1-bit ignore mask
        out._raw_device_seg = res.seg_dev_full
    return out


def _finish_bca_task(task_name: str, res, label_map,
                     output_file: Path) -> nifti.NiftiImage:
    """Pure-host tail of one BCA model: per-task postprocess + save.

    No device calls — safe to run on the background HostWorker while the
    calling thread dispatches the next model (`infer/infer.py:39-89`
    runs this serially on the reference's multi-core host)."""
    out = _postprocess_bca_task(task_name, res, label_map)
    if task_name == "body_parts":
        # pre-pack the torso mask for the report builder here, on the
        # worker, overlapped — Builder.__init__ otherwise pays the two
        # full-volume host passes (== TORSO, packbits) on the main thread
        # (~1.5-2 s at 600 slices on this 1-core host)
        from boa_tpu.bca.definitions import BodyPart

        out._torso_packed = np.packbits(
            (np.asarray(out.data) == int(BodyPart.TORSO)).reshape(-1))
    t0 = _time.perf_counter()
    nifti.save(out, output_file)
    logger.info("BCA %s saved in %.2fs", task_name,
                _time.perf_counter() - t0)
    return out


def bca_inference(
    ct_img: nifti.NiftiImage,
    output_dir: Path,
    task_name: str,
    store: ModelStore,
    fast_bca: bool = False,
    recompute: bool = False,
    compute_dtype: str = "bfloat16",
    fake_predict: Callable | None = None,
    worker=None,
    inline_postprocess: bool = False,
):
    """Run one BCA model incl. its postprocessing; cached on disk.

    Returns the finished NiftiImage — or, when `worker` is given, a
    Future of it (postprocess+save deferred to the host thread).
    `inline_postprocess=True` keeps the postprocess on the calling thread
    and defers only the gzip save, returning the NiftiImage directly —
    for outputs a downstream stage consumes immediately (body_regions
    feeds the tissue pass)."""
    output_file = Path(output_dir) / f"{task_name}.nii.gz"
    if not recompute and output_file.is_file():
        logger.info("Loading already computed %s...", task_name)
        img = nifti.load(output_file)
        if worker is None or inline_postprocess:
            return img
        fut: Future = Future()
        fut.set_result(img)
        return fut
    t0 = _time.perf_counter()
    res = predict_image(ct_img, task_name, store, fast=fast_bca,
                        compute_dtype=compute_dtype, fake_predict=fake_predict,
                        keep_device_seg=(task_name == "body_regions"))
    logger.info("BCA %s predicted in %.2fs", task_name,
                _time.perf_counter() - t0)
    if worker is not None and not inline_postprocess:
        return worker.submit(f"bca-{task_name}-finish", _finish_bca_task,
                             task_name, res, res.label_map, output_file)
    if worker is not None:
        out = _postprocess_bca_task(task_name, res, res.label_map)
        worker.submit(f"save-{task_name}.nii.gz", nifti.save, out,
                      output_file)
        return out
    return _finish_bca_task(task_name, res, res.label_map, output_file)


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
    worker=None,
    stats_out: dict[str, Any] | None = None,
    images_out: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Returns the bca-measurements dict (also written to disk).

    With a `worker` (utils/stages.HostWorker) the host tails overlap the
    device stages: body_parts postprocess+save runs while body_regions
    predicts and tissues transfer; gzip saves run behind the report
    builder; the PDF render is left in flight for the orchestrator to
    reap. All .nii.gz/.json files are on disk when this returns."""
    output_dir = Path(output_dir)
    output_dir.mkdir(exist_ok=True, parents=True)
    store = store or ModelStore()
    ct_img = (input_image if isinstance(input_image, nifti.NiftiImage)
              else nifti.load(input_image))
    save_futures: list = []

    # body_parts: the host postprocess (cv2 contour fill + CC) hides
    # behind the body_regions predict below
    body_parts_res = bca_inference(ct_img, output_dir, "body_parts", store,
                                   fast_bca, recompute=recompute,
                                   compute_dtype=compute_dtype,
                                   fake_predict=fake_predict, worker=worker)

    # body_regions: its postprocessed labels feed the tissue pass NOW, so
    # postprocess stays on this thread (native keep-largest, fast) and
    # only the gzip save is deferred
    body_regions_img = bca_inference(ct_img, output_dir, "body_regions",
                                     store, fast_bca, recompute=recompute,
                                     compute_dtype=compute_dtype,
                                     fake_predict=fake_predict, worker=worker,
                                     inline_postprocess=True)

    t0 = _time.perf_counter()
    regions = np.asarray(body_regions_img.data)
    # device_data: the CT upload is cached on the image instance; the raw
    # device seg (when the predict ran this process) replaces the regions
    # re-upload with a 1-bit ignore-mask transfer
    tissues, tissues_dev, regions_dev = subclassify_tissues(
        ct_img.device_data(), regions, median_filtering=median_filtering,
        return_device=True,
        regions_dev_raw=getattr(body_regions_img, "_raw_device_seg", None),
        ct_host=np.asarray(ct_img.data), defer_host=(worker is not None))
    logger.info("Tissues subclassified in %.2fs", _time.perf_counter() - t0)
    t0 = _time.perf_counter()
    tissue_labels = {int(k): v for v, k in class_maps.bca_tissues().items()}
    if callable(tissues):
        # native host rebuild, deferred: runs on the worker (no device
        # calls) fused with the gzip save; the main thread stays on the
        # device path and never materializes the host tissue map (the PDF
        # slices come from tissues_dev in Builder.prepare)
        build_host = tissues
        tissues = None

        def _build_and_save(affine=body_regions_img.affine,
                            ci=getattr(body_regions_img, "crop_info", None)):
            img = nifti.NiftiImage(data=build_host(), affine=affine,
                                   crop_info=ci)
            img.set_label_map(tissue_labels)
            nifti.save(img, output_dir / "tissues.nii.gz")
            return img

        tis_fut = worker.submit("tissues-host+save", _build_and_save)
        save_futures.append(tis_fut)
        tis_img = None
    else:
        tis_img = nifti.NiftiImage(
            data=tissues, affine=body_regions_img.affine,
            crop_info=getattr(body_regions_img, "crop_info", None))
        tis_img.set_label_map(tissue_labels)
        tis_fut = None
        if worker is not None:
            save_futures.append(worker.submit(
                "save-tissues.nii.gz", nifti.save, tis_img,
                output_dir / "tissues.nii.gz"))
        else:
            nifti.save(tis_img, output_dir / "tissues.nii.gz")

    # total segmentation + measurements (produced by the BOA orchestrator);
    # the in-memory seg from the orchestrator skips a 78 MB gunzip reload
    total_path = output_dir / "total.nii.gz"
    if total_seg is None and total_path.exists():
        total_seg = np.asarray(nifti.load(total_path).data)
        ci = getattr(ct_img, "crop_info", None)
        if ci is not None and total_seg.shape[:2] != ct_img.shape[:2]:
            # disk reload is on the full grid; this run is body-cropped
            total_seg = total_seg[ci.x0:ci.x1, ci.y0:ci.y1]
    tm_path = output_dir / "total-measurements.json"
    total_measurements = json.loads(tm_path.read_text()) if tm_path.exists() else None
    logger.info("BCA tissues save + total reload in %.2fs",
                _time.perf_counter() - t0)

    body_parts_img = (body_parts_res.result()
                      if isinstance(body_parts_res, Future) else body_parts_res)

    t0 = _time.perf_counter()
    spacing = ct_img.zooms
    builder = Builder(ct_img.device_data(), np.asarray(body_parts_img.data),
                      regions, tissues, spacing, theme,
                      tissues_dev=tissues_dev, regions_dev=regions_dev,
                      torso_packed=getattr(body_parts_img, "_torso_packed",
                                           None))
    logger.info("BCA builder init in %.2fs", _time.perf_counter() - t0)
    if examined_body_region:
        body_part = AggregatableBodyPart[examined_body_region.upper()]
    else:
        body_part = AggregatableBodyPart.from_body_regions(
            regions, spacing[2], z_counts=builder.region_z_counts())
        if body_part == AggregatableBodyPart.NONE:
            logger.warning("No supported body part detected")
    builder.examined_body_part = body_part

    if stats_out is not None:
        # presence flags for the study stats (commands.py:206-216 reads
        # them back from disk in the reference; the per-region z counts
        # are already resident here)
        zc = builder.region_z_counts()
        flag = 0
        for bit, region in ((1, BodyRegion.ABDOMINAL_CAVITY),
                            (2, BodyRegion.THORACIC_CAVITY),
                            (4, BodyRegion.BRAIN)):
            r = int(region)
            if r < zc.shape[1] and zc[:, r].sum() > 0:
                flag |= bit
        stats_out["bca_regions"] = flag

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
        if worker is not None:
            worker.submit("bca-report-pdf", _write_pdf, builder, prepared,
                          output_dir / "report.pdf")
        else:
            _write_pdf(builder, prepared, output_dir / "report.pdf")
            logger.info("BCA PDF rendered in %.2fs",
                        _time.perf_counter() - t0)
    t0 = _time.perf_counter()
    json_data = builder.create_json(**prepared)

    if vertebrae_info:
        (output_dir / "vertebrae.json").write_text(
            json.dumps(vertebrae_info, indent=2))
    (output_dir / "bca-measurements.json").write_text(
        json.dumps(json_data, indent=2))
    logger.info("BCA json in %.2fs", _time.perf_counter() - t0)
    # file contract for callers reading the segs back (the PDF may still
    # be rendering on the worker; analyze_ct reaps it)
    for fut in save_futures:
        fut.result()
    if tis_fut is not None:
        tis_img = tis_fut.result()
    if images_out is not None:
        images_out["body_parts"] = body_parts_img
        images_out["body_regions"] = body_regions_img
        images_out["tissues"] = tis_img
    return json_data


def _write_pdf(builder: Builder, prepared: dict[str, Any],
               path: Path) -> None:
    path.write_bytes(builder.create_pdf(**prepared))
