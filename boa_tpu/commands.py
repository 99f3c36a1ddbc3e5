"""End-to-end study orchestrator.

Parity target: `body_organ_analysis/commands.py:41-288` — same public
surface (``analyze_ct`` signature, stats keys, Excel sheet schema, the
``debug_information.txt`` artifact) implemented as an independent design:
stage spans are recorded by a reusable ``_timed`` context manager, the
debug capture is a small handler-owning object rather than a generator
contextmanager, and each pipeline stage lives in its own helper so the
orchestrator body is just the stage sequence.
"""

from __future__ import annotations

import contextlib
import logging
import os
import platform
import sys
import traceback
from pathlib import Path
from time import time
from typing import Any, Iterable, Iterator

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


class RunDebugFile:
    """Per-run ``debug_information.txt`` capture.

    Behavior spec (mirrors the reference's debug artifact, not its code):
    every log record emitted anywhere in the process during the run —
    including third-party warnings routed through ``logging`` — must land
    in the file, prefixed by an environment header that never reaches the
    console. ``append_raw`` lets error paths dump raw text (tracebacks)
    into the same file without going through the logging system.

    Implemented as a handler-owning context object: ``__enter__`` seeds
    the file with the header and hooks a ``FileHandler`` onto the root
    logger; ``__exit__`` records any in-flight exception, then unhooks.
    """

    def __init__(self, path: Path, header: str = "") -> None:
        self.path = Path(path)
        self.header = header
        self._handler: logging.FileHandler | None = None

    def __enter__(self) -> "RunDebugFile":
        self.path.write_text(self.header)
        fh = logging.FileHandler(self.path, mode="a")
        fh.setFormatter(logging.Formatter(
            fmt="%(asctime)s | %(levelname)-8s | %(name)s | %(message)s"))
        logging.getLogger().addHandler(fh)
        self._handler = fh
        return self

    def append_raw(self, text: str) -> None:
        """Write `text` verbatim to the debug file (console never sees it)."""
        fh = self._handler
        if fh is None:  # outside the context: best-effort plain append
            with self.path.open("a") as f:
                f.write(text if text.endswith("\n") else text + "\n")
            return
        with fh.lock:  # serialize against concurrent emit() calls
            fh.stream.write(text if text.endswith("\n") else text + "\n")
            fh.flush()

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is not None:
            logger.error("analyze_ct aborted with %s", exc_type.__name__,
                         exc_info=(exc_type, exc, tb))
        fh = self._handler
        self._handler = None
        if fh is not None:
            logging.getLogger().removeHandler(fh)
            fh.close()


@contextlib.contextmanager
def _timed(stats: dict[str, Any], key: str | None, label: str) -> Iterator[None]:
    """Stage span: on exit, log the wall time and (if keyed) record it."""
    t0 = time()
    yield
    dt = time() - t0
    logger.info("%s took %.5f s", label, dt)
    if key is not None:
        stats[key] = dt


def _environment_header(device: str, models: list[str], fast_bca: bool,
                        fast_total: bool, contrast: bool, pdf: bool) -> str:
    """Plain-text run provenance block written at the top of the debug file.

    The first line must start with ``Platform:`` (pinned by tests and by
    the reference artifact's shape)."""
    import jax

    rows = [
        ("Platform", platform.system()),
        ("Python version", sys.version),
        ("BOA version", __version__),
        ("BOA githash", __githash__),
        ("JAX backend", jax.default_backend()),
        ("Device", device),
        ("Fast BCA", fast_bca),
        ("Fast Total", fast_total),
        ("Contrast Prediction", contrast),
        ("PDF generation", pdf),
        ("Models", models),
    ]
    return "".join(f"{k}: {v}\n" for k, v in rows) + "\n"


def _load_study(input_folder: Path, out: Path) -> tuple[Path, list[dict[str, Any]]]:
    """Resolve the input to a NIfTI path (+ DICOM metadata rows if any)."""
    if input_folder.is_file() and ".nii" in input_folder.name.lower():
        return input_folder, []
    from boa_tpu.io.dicom_io import get_image_info

    return get_image_info(input_folder=input_folder, output_folder=out)


def _bca_regions_flag(seg_output: Path) -> int | None:
    """Presence bitmask (1=abdomen, 2=thorax, 4=brain) from the saved
    body-regions map — the cached-BCA fallback when run_pipeline didn't
    fill it from its resident per-region counts."""
    regions_path = seg_output / "body_regions.nii.gz"
    if not regions_path.is_file():
        return None
    from boa_tpu.ops.connected_components import histogram_u8

    # One histogram pass answers all three presence bits; three separate
    # `== label` scans would cost ~3 full-volume reads on this host
    # (CLAUDE.md host-glue rule).
    regions = np.asarray(nifti.load(regions_path).data)
    hist = histogram_u8(regions) if regions.dtype == np.uint8 \
        else np.bincount(regions.ravel().astype(np.intp), minlength=256)
    flag = 0
    for bit, region in ((1, BodyRegion.ABDOMINAL_CAVITY),
                        (2, BodyRegion.THORACIC_CAVITY),
                        (4, BodyRegion.BRAIN)):
        if hist[int(region)]:
            flag |= bit
    return flag


def _predict_contrast(ct_path: Path, seg_output: Path, ct_info: list,
                      stats: dict[str, Any]) -> None:
    """IV-phase + GIT contrast prediction rows (info sheet + stats)."""
    from boa_tpu.compute.contrast import predict

    with _timed(stats, None, "Contrast phase prediction"):
        result = predict(ct_path=ct_path, segmentation_folder=seg_output)
    ct_info.append({"name": "PredictedContrastPhase",
                    "value": result["phase_ensemble_predicted_class"]})
    ct_info.append({"name": "PredictedContrastInGIT",
                    "value": result["git_ensemble_predicted_class"]})
    if result.get("git_classifier_is_standin", False):
        # the vendored GIT model is a synthetic-phantom stand-in (the
        # reference's clinically-trained boa-contrast artifact is not
        # publicly vendored) — say so IN the sheet, loudly (VERDICT r3 #8)
        ct_info.append({"name": "PredictedContrastInGITNote",
                        "value": "stand-in classifier trained on synthetic "
                                 "phantoms; NOT clinically validated"})
    stats["iv_contrast_phase"] = result["phase_ensemble_prediction"]
    stats["git_contrast"] = result["git_ensemble_prediction"]


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

    debug = RunDebugFile(
        processed_output_folder / "debug_information.txt",
        header=_environment_header(device, models, fast_bca, fast_total,
                                   compute_contrast_information, bca_pdf))

    # SURVEY §5 tracing: stage-span stats (via _timed) plus optional device
    # traces — set BOA_PROFILE=<dir> to capture a jax.profiler trace of the
    # whole study for xprof/tensorboard.
    profile_dir = os.environ.get("BOA_PROFILE")
    if profile_dir:
        import jax

        profiler_ctx = jax.profiler.trace(profile_dir)
    else:
        profiler_ctx = contextlib.nullcontext()

    own_worker = worker is None
    worker_ctx = HostWorker() if own_worker else contextlib.nullcontext(worker)
    with debug, profiler_ctx, worker_ctx as worker:
        # owned worker: aborts pending host stages if a stage below raises
        if cnr_adjustment and "heartchambers_highres" not in models:
            logger.warning(
                "--cnr-adjustment is enabled but 'heartchambers_highres' is "
                "not among the selected models: the CNR-adjusted pulmonary "
                "artery measurement will not be computed. The aorta and "
                "autochthon measurements (from 'total') are unaffected.")

        stats: dict[str, Any] = {"git_hash": __githash__,
                                 "boa_version": __version__}
        start_total = time()

        # -- stage: ingest ------------------------------------------------
        with _timed(stats, None, "Study ingest"):
            ct_path, dicom_info = _load_study(input_folder,
                                              processed_output_folder)
        ct_info: list[dict[str, Any]] = [
            {"name": "BOAVersion", "value": __version__},
            {"name": "BOAGitHash", "value": __githash__},
            *dicom_info,
        ]

        # -- stage: segmentation models ------------------------------------
        seg_output = processed_output_folder
        seg_images: dict[str, Any] = {}  # in-memory segs for the metrics
        with _timed(stats, "inference_time", "All segmentation models"):
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
        stats.update(ct_stats)

        # -- stage: BCA workbook rows ---------------------------------------
        aggr_df = slices_df = slices_no_limbs_df = None
        if "bca" in models:
            with _timed(stats, "bca_metrics_time", "BCA metrics"):
                aggr_df, slices_df, slices_no_limbs_df = compute_bca_metrics(
                    output_path=seg_output)
            if "bca_regions" not in stats:
                flag = _bca_regions_flag(seg_output)
                if flag is not None:
                    stats["bca_regions"] = flag

        # -- stage: TotalSegmentator workbook rows ----------------------------
        regions_df = cnr_df = None
        if any(a in models for a in (*ADDITIONAL_MODELS_OUTPUT_NAME, "total")):
            with _timed(stats, "totalsegmentator_metrics_time",
                        "TotalSegmentator metrics"):
                region_information, regions_df, cnr_df = \
                    compute_segmentator_metrics(
                        ct_path=ct_path, segmentation_folder=seg_output,
                        store_axes=False, seg_images=seg_images)
            ct_info += region_information

        # -- stage: contrast classifier ---------------------------------------
        if compute_contrast_information and "total" in models:
            try:
                _predict_contrast(ct_path, seg_output, ct_info, stats)
            except Exception:
                logger.warning("Contrast phase prediction failed")
                debug.append_raw(traceback.format_exc())

        # -- stage: workbook --------------------------------------------------
        excel_path = excel_output_folder / "output.xlsx"
        with _timed(stats, "excel_time", "Workbook write"):
            write_output_workbook(
                excel_path, pd.DataFrame(ct_info).set_index("name"),
                regions_df, cnr_df, aggr_df, slices_df, slices_no_limbs_df)

        if own_worker:
            worker.close()  # reap deferred preview/PDF renders
        stats["total_time"] = time() - start_total
        logger.info("Complete CT analysis took %.5f s", stats["total_time"])
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
