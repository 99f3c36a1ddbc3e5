"""End-to-end study orchestrator.

Parity: `body_organ_analysis/commands.py:41-288` — `analyze_ct` runs
DICOM/NIfTI ingest → all requested models → BCA + TS metrics → contrast
prediction → the Excel workbook, with per-stage timing stats and a per-run
`debug_information.txt` capturing every log record (including third-party
warnings) plus an environment header.
"""

from __future__ import annotations

import logging
import platform
import sys
import traceback
from contextlib import contextmanager
from pathlib import Path
from time import time
from typing import Any, Callable, Iterable, Iterator

import numpy as np
import pandas as pd

from boa_tpu.version import __version__
from boa_tpu.bca.definitions import BodyRegion
from boa_tpu.compute.bca_metrics import compute_bca_metrics
from boa_tpu.compute.inference import compute_all_models
from boa_tpu.compute.ts_metrics import compute_segmentator_metrics
from boa_tpu.io import nifti, xlsx
from boa_tpu.utils.misc import ADDITIONAL_MODELS_OUTPUT_NAME
from boa_tpu.utils.stages import HostWorker

logger = logging.getLogger(__name__)

def _resolve_githash() -> str:
    """Best-effort repo hash for provenance rows (reference _version.py)."""
    try:
        from pathlib import Path

        root = Path(__file__).resolve().parent.parent / ".git"
        head = (root / "HEAD").read_text().strip()
        if head.startswith("ref: "):
            ref = root / head[5:]
            if ref.exists():
                return ref.read_text().strip()[:12]
            packed = root / "packed-refs"
            if packed.exists():
                for line in packed.read_text().splitlines():
                    if line.endswith(head[5:]):
                        return line.split()[0][:12]
            return "unknown"
        return head[:12]
    except Exception:
        return "unknown"


__githash__ = _resolve_githash()


@contextmanager
def _debug_log_handler(path: Path, header: str = "") -> Iterator[Callable[[str], None]]:
    """Root FileHandler capturing ALL records into debug_information.txt
    (`commands.py:41-69`); the header bypasses logging entirely."""
    path.write_text(header)
    handler = logging.FileHandler(path, mode="a")
    handler.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s"))
    root = logging.getLogger()
    root.addHandler(handler)

    def write_debug(text: str) -> None:
        handler.acquire()
        try:
            handler.stream.write(text if text.endswith("\n") else text + "\n")
            handler.flush()
        finally:
            handler.release()

    try:
        yield write_debug
    except Exception:
        logger.exception("BOA run failed")
        raise
    finally:
        root.removeHandler(handler)
        handler.close()


def analyze_ct(
    input_folder: Path,
    processed_output_folder: Path,
    excel_output_folder: Path,
    models: Iterable[str],
    compute_contrast_information: bool = True,
    total_preview: bool = True,
    device: str = "tpu",
    license_number: str | None = None,
    bca_median_filtering: bool = False,
    bca_examined_body_region: str | None = None,
    bca_pdf: bool = True,
    recompute: bool = False,
    fast_bca: bool = False,
    fast_total: bool = False,
    cnr_adjustment: bool = False,
    theme: str = "light",
    nr_thr_resamp: int = 1,          # accepted for API parity; resampling
    nr_thr_saving: int = 6,          # and saving are device/XLA-side here
    nnunet_verbose: bool = False,
    fake_predict=None,
    worker: HostWorker | None = None,
) -> tuple[Path, dict[str, Any]]:
    """Full study analysis; returns (excel path, stats dict).

    Passing a shared `worker` (utils/stages.HostWorker) lets a study
    stream carry this study's deferred host tails (preview render,
    report PDF) into the next study's device time; the caller then owns
    reaping it (worker.barrier()/close()). Without one, all artifacts
    are on disk when this returns."""
    input_folder = Path(input_folder)
    processed_output_folder = Path(processed_output_folder)
    excel_output_folder = Path(excel_output_folder)
    processed_output_folder.mkdir(parents=True, exist_ok=True)
    excel_output_folder.mkdir(parents=True, exist_ok=True)
    models = list(models)

    import jax

    backend = jax.default_backend()
    header = (
        f"Platform: {platform.system()}\n"
        f"Python version: {sys.version}\n"
        f"BOA version: {__version__}\n"
        f"BOA githash: {__githash__}\n"
        f"JAX backend: {backend}\n"
        f"Device: {device}\n"
        f"Fast BCA: {fast_bca}\n"
        f"Fast Total: {fast_total}\n"
        f"Contrast Prediction: {compute_contrast_information}\n"
        f"PDF generation: {bca_pdf}\n"
        f"Models: {models}\n\n"
    )

    import contextlib
    import os

    # SURVEY §5 tracing: stage-span stats (below) plus optional device
    # traces — set BOA_PROFILE=<dir> to capture a jax.profiler trace of the
    # whole study for xprof/tensorboard.
    profile_dir = os.environ.get("BOA_PROFILE")
    profiler_ctx = jax.profiler.trace(profile_dir) if profile_dir \
        else contextlib.nullcontext()

    own_worker = worker is None
    worker_ctx = HostWorker() if own_worker else contextlib.nullcontext(worker)
    with _debug_log_handler(processed_output_folder / "debug_information.txt",
                            header=header) as write_debug, profiler_ctx, \
            worker_ctx as worker:  # (owned) aborts pending stages on error
        if cnr_adjustment and "heartchambers_highres" not in models:
            logger.warning(
                "--cnr-adjustment is enabled but 'heartchambers_highres' is "
                "not among the selected models: the CNR-adjusted pulmonary "
                "artery measurement will not be computed. The aorta and "
                "autochthon measurements (from 'total') are unaffected.")
        start_total = time()
        ct_info: list[dict[str, Any]] = []
        if input_folder.is_file() and ".nii" in input_folder.name.lower():
            ct_path = input_folder
        else:
            from boa_tpu.io.dicom_io import get_image_info

            ct_path, ct_info = get_image_info(
                input_folder=input_folder,
                output_folder=processed_output_folder)
        ct_info = [
            {"name": "BOAVersion", "value": __version__},
            {"name": "BOAGitHash", "value": __githash__},
            *ct_info,
        ]
        logger.info("Image loaded and retrieved: DONE in %0.5fs",
                    time() - start_total)

        stats: dict[str, Any] = {"git_hash": __githash__,
                                 "boa_version": __version__}
        seg_output = processed_output_folder
        start = time()
        seg_images: dict[str, Any] = {}  # in-memory segs for the metrics
        ct_stats = compute_all_models(
            ct_path=ct_path,
            segmentation_folder=seg_output,
            models_to_compute=models,
            fast_bca=fast_bca,
            force_split_threshold=400,
            totalsegmentator_params={
                "preview": total_preview,
                "fast": fast_total,
                "license_number": license_number,
            },
            bca_params={
                "median_filtering": bca_median_filtering,
                "examined_body_region": bca_examined_body_region,
                "save_pdf": bca_pdf,
                "theme": theme,
            },
            recompute=recompute,
            cnr_adjustment=cnr_adjustment,
            fake_predict=fake_predict,
            worker=worker,
            images_out=seg_images,
        )
        logger.info("All models computed: DONE in %0.5fs", time() - start)
        stats["inference_time"] = time() - start
        stats.update(ct_stats)

        aggr_df, slices_df, slices_no_limbs_df = None, None, None
        if "bca" in models:
            start = time()
            aggr_df, slices_df, slices_no_limbs_df = compute_bca_metrics(
                output_path=seg_output)
            logger.info("Metrics from BCA: DONE in %0.5fs", time() - start)
            stats["bca_metrics_time"] = time() - start
            if "bca_regions" not in stats:
                # fallback for cached-BCA runs (run_pipeline fills this
                # from its resident per-region z counts otherwise)
                regions_path = seg_output / "body_regions.nii.gz"
                if regions_path.is_file():
                    from boa_tpu.ops.connected_components import histogram_u8

                    # one histogram pass answers all three presence bits
                    # (three `== label` scans cost ~3 full-volume reads on
                    # this host; CLAUDE.md host-glue rule)
                    regions = np.asarray(nifti.load(regions_path).data)
                    hist = histogram_u8(regions) if regions.dtype == np.uint8 \
                        else np.bincount(regions.ravel().astype(np.intp),
                                         minlength=256)
                    regions_flag = 0
                    if hist[int(BodyRegion.ABDOMINAL_CAVITY)]:
                        regions_flag |= 1
                    if hist[int(BodyRegion.THORACIC_CAVITY)]:
                        regions_flag |= 2
                    if hist[int(BodyRegion.BRAIN)]:
                        regions_flag |= 4
                    stats["bca_regions"] = regions_flag

        regions_df = None
        cnr_df = None
        if any(a in models for a in (*ADDITIONAL_MODELS_OUTPUT_NAME, "total")):
            start = time()
            region_information, regions_df, cnr_df = compute_segmentator_metrics(
                ct_path=ct_path, segmentation_folder=seg_output,
                store_axes=False, seg_images=seg_images)
            logger.info("Metrics from TotalSegmentator: DONE in %0.5fs",
                        time() - start)
            stats["totalsegmentator_metrics_time"] = time() - start
            ct_info += region_information

        if compute_contrast_information and "total" in models:
            try:
                from boa_tpu.compute.contrast import predict

                start = time()
                contrast_information = predict(
                    ct_path=ct_path, segmentation_folder=seg_output)
                logger.info("Contrast phase predicted: DONE in %0.5fs",
                            time() - start)
                ct_info.append({
                    "name": "PredictedContrastPhase",
                    "value": contrast_information[
                        "phase_ensemble_predicted_class"]})
                ct_info.append({
                    "name": "PredictedContrastInGIT",
                    "value": contrast_information[
                        "git_ensemble_predicted_class"]})
                stats["iv_contrast_phase"] = contrast_information[
                    "phase_ensemble_prediction"]
                stats["git_contrast"] = contrast_information[
                    "git_ensemble_prediction"]
            except Exception:
                logger.warning("Contrast phase prediction failed")
                write_debug(traceback.format_exc())

        info_df = pd.DataFrame(ct_info).set_index("name")
        excel_path = excel_output_folder / "output.xlsx"
        start = time()
        write_output_workbook(excel_path, info_df, regions_df, cnr_df,
                              aggr_df, slices_df, slices_no_limbs_df)
        logger.info("Excel stored: DONE in %0.5fs", time() - start)
        stats["excel_time"] = time() - start
        if own_worker:
            worker.close()  # reap deferred preview/PDF renders
        logger.info("Complete CT analysis: DONE in %0.5fs",
                    time() - start_total)
        stats["total_time"] = time() - start_total
        return excel_path, stats


CNR_WARNING = ("These results were yielded by a modified version of BOA, "
               "adjusted for image quality assessment.")


def write_output_workbook(excel_path: Path, info_df, regions_df=None,
                          cnr_df=None, aggr_df=None, slices_df=None,
                          slices_no_limbs_df=None) -> None:
    """The output.xlsx sheet layout of `commands.py:245-283`."""
    wb = xlsx.Workbook()
    info = wb.add_sheet("info")
    for name, row in info_df.iterrows():
        info.add_row([name, *row.tolist()])
    if regions_df is not None:
        wb.add_dataframe(regions_df, "regions-statistics")
    if cnr_df is not None:
        sheet = wb.add_dataframe(cnr_df, "cnr-adjusted", startrow=1)
        sheet.rows[0] = [(CNR_WARNING, xlsx.FMT_WARNING)]
        sheet.merge_row(0, 0, max(len(cnr_df.columns) - 1, 0))
    if aggr_df is not None:
        wb.add_dataframe(aggr_df, "bca-aggregated-measurements")
    if slices_df is not None:
        wb.add_dataframe(slices_df, "bca-slice-measurements")
    if slices_no_limbs_df is not None:
        wb.add_dataframe(slices_no_limbs_df, "bca-slice-measurements_no_ext")
    wb.save(excel_path)
