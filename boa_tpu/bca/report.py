"""BCA report builder: slice-wise tissue curves, aggregations, findings,
JSON + PDF.

Parity: `body_composition_analysis/report/builder.py` —
`AggregatableBodyPart.from_body_regions` (`:44-112`: abdomen >= 200 mm of
abdominal cavity, neck >= 100 mm above the mediastinum, thorax >= 200 mm
overlapping the abdomen), `generate_aggregated_measurements` (`:163-261`),
`_descriptive_statistics_from_measurements` (`:265-305`: pandas describe +
per-tissue MeanHU + TAT), `generate_secondary_findings` (`:309-395`: cavity
volumes, breast-implant detection), `prepare` (`:397-518`), `create_json`
(`:520-598`, schema preserved exactly).

Axis convention: volumes are (x, y, z) RAS; the reference works on (z, y, x)
LPS sitk arrays — slice indices along z are identical in both; left/right
logic is adapted to RAS (+x = patient right... +x points Right in RAS, which
is LPS low-x).

TPU design: all slice-wise reductions (tissue volumes per slice, per-tissue
HU sums/counts per slice) come from ONE jitted segmented pass; group
aggregations are then O(slices) host work on exact partial sums.
"""

from __future__ import annotations

import enum
import logging
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from boa_tpu import native
from boa_tpu.bca.definitions import ADIPOSE_TISSUES, BodyPart, BodyRegion, Tissue
from boa_tpu.ops import connected_components as cc
from boa_tpu.version import __version__

logger = logging.getLogger(__name__)

TISSUE_COLS = ["Bone", "Muscle", "TAT", "IMAT", "SAT", "VAT", "PAT", "EAT"]


def _pretty_volume(value: float) -> str:
    if value >= 1000:
        return f"{value / 1000:.3f} L"
    return f"{value:.2f} mL"


class AggregatableBodyPart(enum.IntFlag):
    NONE = 0
    ABDOMEN = 1
    THORAX = 2
    NECK = 4

    @staticmethod
    def from_body_regions(region_data: np.ndarray, slice_thickness: float,
                          min_abdomen_length: float = 200,
                          min_neck_length: float = 100,
                          min_thorax_length: float = 200,
                          z_counts: np.ndarray | None = None
                          ) -> "AggregatableBodyPart":
        """Detect the examined body part (`report/builder.py:44-112`).

        z_counts: optional (nz, n_labels) per-slice region histogram
        (Builder.region_z_counts) — avoids three full-volume scans.
        """
        result = AggregatableBodyPart.NONE
        nz = region_data.shape[2]

        def _presence(labels) -> np.ndarray:
            labels = np.atleast_1d(labels)
            if z_counts is not None:
                cols = [lb for lb in labels if lb < z_counts.shape[1]]
                if not cols:
                    return np.zeros(nz, bool)
                return z_counts[:, cols].sum(axis=1) > 0
            if len(labels) == 1:
                return (region_data == labels[0]).any(axis=(0, 1))
            return np.isin(region_data, labels).any(axis=(0, 1))

        abdomen_any = _presence(int(BodyRegion.ABDOMINAL_CAVITY))
        abdomen_slices = np.where(abdomen_any)[0]
        n_abd = (abdomen_slices.max() - abdomen_slices.min() + 1
                 if abdomen_slices.size else 0)
        if n_abd * slice_thickness >= min_abdomen_length:
            result |= AggregatableBodyPart.ABDOMEN

        med_any = _presence(int(BodyRegion.MEDIASTINUM))
        med_slices = np.where(med_any)[0]
        n_above = nz - med_slices.max() if med_slices.size else 0
        if n_above * slice_thickness >= min_neck_length:
            result |= AggregatableBodyPart.NECK

        thorax_any = _presence([int(BodyRegion.THORACIC_CAVITY),
                                int(BodyRegion.MEDIASTINUM),
                                int(BodyRegion.PERICARDIUM)])
        thorax_slices = np.where(thorax_any)[0]
        n_tho = (thorax_slices.max() - thorax_slices.min() + 1
                 if thorax_slices.size else 0)
        has_overlap = bool(np.logical_and(abdomen_any, thorax_any).any())
        if has_overlap and n_tho * slice_thickness >= min_thorax_length:
            result |= AggregatableBodyPart.THORAX
        return result


# ---------------------------------------------------------------------------
# device pass: per-slice per-tissue volumes and HU sums (with/without limbs)
# ---------------------------------------------------------------------------

_N_TISSUE = len(Tissue) + 1  # + background


@jax.jit
def _slicewise_pass(ct: jax.Array, tissues: jax.Array, torso: jax.Array):
    """Returns (counts, husums, counts_nl, husums_nl): (nz, n_tissue) each.

    One-hot over the 9 tissue ids reduced over (x, y): TPU scatter-adds
    (what segment_sum lowers to) serialize per-segment, while this is a
    fused bandwidth-bound reduce XLA handles at full speed."""
    t = tissues.astype(jnp.int32)
    ctf = ct.astype(jnp.float32)
    torso_f = torso.astype(jnp.float32)
    oh = (t[..., None] == jnp.arange(_N_TISSUE, dtype=jnp.int32)
          ).astype(jnp.float32)                      # (x, y, z, n_tissue)
    counts = jnp.sum(oh, axis=(0, 1))
    husums = jnp.sum(oh * ctf[..., None], axis=(0, 1))
    counts_nl = jnp.sum(oh * torso_f[..., None], axis=(0, 1))
    husums_nl = jnp.sum(oh * (ctf * torso_f)[..., None], axis=(0, 1))
    return counts, husums, counts_nl, husums_nl


def _tissue_name(t: Tissue) -> str:
    return t.name.capitalize() if t in (Tissue.BONE, Tissue.MUSCLE) else t.name


@partial(jax.jit, static_argnames=("shape",))
def _unpack_mask(packed: jax.Array, shape: tuple[int, int, int]) -> jax.Array:
    """Device-side np.packbits inverse (MSB-first). Uploading the 1-bit
    torso mask packed cuts the tunnel payload (and its host-side
    compression cost) 8x vs a bool volume."""
    n = shape[0] * shape[1] * shape[2]
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[:, None] >> shifts[None, :]) & jnp.uint8(1)
    return bits.reshape(-1)[:n].reshape(shape)


@partial(jax.jit, static_argnames=("axis",))
def _tissue_density_pass(tissues: jax.Array, axis: int) -> jax.Array:
    """(n_tissues-1, h, w) float32 density fractions along `axis` on
    device — the twin of bca/plots.tissue_densities for the deferred-host
    case (one fused one-hot reduce; ~4 MB download per axis)."""
    t = tissues.astype(jnp.int32)
    oh = (t[..., None] == jnp.arange(1, _N_TISSUE, dtype=jnp.int32)
          ).astype(jnp.float32)
    return jnp.moveaxis(jnp.sum(oh, axis=axis) / t.shape[axis], -1, 0)


@partial(jax.jit, static_argnames=("width",))
def _region_z_pass(regions: jax.Array, width: int) -> jax.Array:
    """(nz, width) per-slice region-label counts on device (one-hot
    reduce — same rationale as _slicewise_pass)."""
    oh = (regions.astype(jnp.int32)[..., None]
          == jnp.arange(width, dtype=jnp.int32)).astype(jnp.int32)
    return jnp.sum(oh, axis=(0, 1))


class Builder:
    """Report builder over (x, y, z) RAS arrays on a common grid."""

    def __init__(self, ct_data: np.ndarray, body_parts: np.ndarray,
                 body_regions: np.ndarray, tissues: np.ndarray,
                 spacing: tuple[float, float, float], theme: str = "light",
                 tissues_dev=None, regions_dev=None, torso_packed=None):
        self._ct = ct_data  # np OR device array (jnp.asarray is a no-op)
        self._parts = np.asarray(body_parts)
        self._regions = np.asarray(body_regions)
        # tissues=None: the host map is being rebuilt on the HostWorker
        # (bca/pipeline.py defer_host) — every consumer here works from
        # tissues_dev instead (PDF slice panels gather on device)
        self._tissues = None if tissues is None else np.asarray(tissues)
        self._tissues_dev = tissues_dev
        self.spacing = tuple(float(s) for s in spacing)
        self.theme = theme
        self.examined_body_part = AggregatableBodyPart(0)
        # NOTE: regions_dev may encode the 255-ignore fragments as 15
        # (bca/tissues.py IGNORE_XFER, packable transfer form); everything
        # here matches real region ids <= 11 by equality, so both forms
        # behave identically.
        self._regions_dev = regions_dev
        self._region_zc: np.ndarray | None = None

        from boa_tpu.utils.timing import Spans

        spans = Spans("builder_init")
        if torso_packed is None:  # else prepacked on the worker, overlapped
            torso_packed = np.packbits(
                (self._parts == int(BodyPart.TORSO)).reshape(-1))
        torso_dev = _unpack_mask(jnp.asarray(torso_packed),
                                 self._parts.shape)
        spans.mark("torso_pack+upload", sync=torso_dev)
        counts, husums, counts_nl, husums_nl = _slicewise_pass(
            jnp.asarray(self._ct),
            tissues_dev if tissues_dev is not None
            else jnp.asarray(self._tissues),
            torso_dev)
        self._counts = np.asarray(counts, np.float64)
        self._husums = np.asarray(husums, np.float64)
        self._counts_nl = np.asarray(counts_nl, np.float64)
        self._husums_nl = np.asarray(husums_nl, np.float64)
        spans.mark("slicewise_pass+readback")

    def axial_ct_slices(self, idxs, stride: int = 1) -> np.ndarray:
        """(x/stride, y/stride, len(idxs)) CT slices on host for the PDF
        overlay pages. A device-resident CT downloads only the requested
        (optionally xy-downsampled) slices — one small gather + transfer,
        not the full volume."""
        idxs = np.asarray(idxs, np.int64)
        if isinstance(self._ct, np.ndarray):
            return np.ascontiguousarray(self._ct[::stride, ::stride, idxs])
        sl = jnp.take(self._ct[::stride, ::stride], jnp.asarray(idxs), axis=2)
        return np.asarray(sl)

    # -- per-z region histogram: every cavity range/volume derives from
    #    this ONE pass (replacing repeated full-volume isin/== scans)
    def region_z_counts(self) -> np.ndarray:
        """(nz, n_region_labels) voxel counts per slice per region."""
        if self._region_zc is None:
            width = int(self._regions.max()) + 1
            nz = self._regions.shape[2]
            if self._regions_dev is not None:
                # the device copy encodes ignore as 15 (IGNORE_XFER), so
                # its labels are < 16 — without the cap a single 255-ignore
                # fragment in the host seg would size the one-hot at 256
                # columns (~16x the compute) for counts nothing reads
                self._region_zc = np.asarray(_region_z_pass(
                    self._regions_dev, min(width, 16)))
            else:
                z = np.broadcast_to(
                    np.arange(nz, dtype=np.int32)[None, None, :],
                    self._regions.shape)
                comb = (z * np.int32(width)
                        + self._regions.astype(np.int32)).ravel()
                self._region_zc = np.bincount(
                    comb, minlength=nz * width).reshape(nz, width)
        return self._region_zc

    def _region_presence_z(self, labels) -> np.ndarray:
        zc = self.region_z_counts()
        cols = [lb for lb in np.atleast_1d(labels) if lb < zc.shape[1]]
        if not cols:
            return np.zeros(zc.shape[0], bool)
        return zc[:, cols].sum(axis=1) > 0

    def _region_volume_ml(self, labels) -> float:
        zc = self.region_z_counts()
        cols = [lb for lb in np.atleast_1d(labels) if lb < zc.shape[1]]
        ml_per_voxel = float(np.prod(self.spacing)) / 1000.0
        return float(zc[:, cols].sum()) * ml_per_voxel if cols else 0.0

    # -- slice-wise dataframes (builder.prepare :397-444) ------------------
    def _slicewise_df(self, counts: np.ndarray) -> pd.DataFrame:
        ml_per_voxel = float(np.prod(self.spacing)) / 1000.0
        data = {_tissue_name(t): counts[:, int(t)] * ml_per_voxel for t in Tissue}
        df = pd.DataFrame(data)
        df["TAT"] = df.SAT + df.VAT + df.IMAT + df.PAT + df.EAT
        df["slice_idx"] = range(len(df))
        return df[["slice_idx", *TISSUE_COLS]]

    def slicewise_measurements(self) -> pd.DataFrame:
        return self._slicewise_df(self._counts)

    def slicewise_measurements_no_limbs(self) -> pd.DataFrame:
        return self._slicewise_df(self._counts_nl)

    # -- aggregation groups (:163-215) --------------------------------------
    def aggregation_groups(self, vertebrae: dict[str, tuple[int, int]] | None
                           ) -> list[tuple[str, int, int]]:
        groups = [("Whole Scan", 0, self._regions.shape[2])]

        def _range(presence_z) -> tuple[int, int]:
            slices = np.where(presence_z)[0]
            return int(slices.min()), int(slices.max() + 1)

        if AggregatableBodyPart.ABDOMEN in self.examined_body_part:
            groups.append(("Abdominal Cavity", *_range(
                self._region_presence_z(int(BodyRegion.ABDOMINAL_CAVITY)))))
        if AggregatableBodyPart.THORAX in self.examined_body_part:
            groups.append(("Thoracic Cavity", *_range(
                self._region_presence_z([int(BodyRegion.THORACIC_CAVITY),
                                         int(BodyRegion.MEDIASTINUM),
                                         int(BodyRegion.PERICARDIUM)]))))
            groups.append(("Mediastinum", *_range(
                self._region_presence_z(int(BodyRegion.MEDIASTINUM)))))
            groups.append(("Pericardium", *_range(
                self._region_presence_z(int(BodyRegion.PERICARDIUM)))))
        if (AggregatableBodyPart.ABDOMEN in self.examined_body_part
                and AggregatableBodyPart.THORAX in self.examined_body_part):
            groups.insert(1, ("Ventral Cavity", groups[1][1], groups[2][2]))
        if vertebrae:
            for name, (lo, hi) in vertebrae.items():
                groups.append((name, lo, hi))
        return groups

    # -- describe-stats per group (:265-305) --------------------------------
    def _group_stats(self, df: pd.DataFrame, counts: np.ndarray,
                     husums: np.ndarray, lo: int, hi: int) -> pd.DataFrame:
        sl = df[(df.slice_idx >= lo) & (df.slice_idx < hi)].drop("slice_idx", axis=1)
        stats = sl.describe()
        stats = stats.drop("count")
        stats.index = ["Mean", "StdDev", "Minimum", "25%", "Median", "75%", "Maximum"]
        stats.loc["Total"] = sl.sum()
        for t in Tissue:
            cnt = counts[lo:hi, int(t)].sum()
            stats.loc["MeanHU", _tissue_name(t)] = (
                husums[lo:hi, int(t)].sum() / cnt if cnt else None)
        tat_cnt = sum(counts[lo:hi, int(t)].sum() for t in ADIPOSE_TISSUES)
        tat_sum = sum(husums[lo:hi, int(t)].sum() for t in ADIPOSE_TISSUES)
        stats.loc["MeanHU", "TAT"] = tat_sum / tat_cnt if tat_cnt else None
        return stats.replace({np.nan: None})

    def generate_aggregated_measurements(self, vertebrae) -> list[tuple]:
        df = self.slicewise_measurements()
        df_nl = self.slicewise_measurements_no_limbs()
        result = []
        for name, lo, hi in self.aggregation_groups(vertebrae):
            stats = self._group_stats(df, self._counts, self._husums, lo, hi)
            stats_nl = self._group_stats(df_nl, self._counts_nl, self._husums_nl,
                                         lo, hi)
            result.append((name, (lo, hi), None, stats, stats_nl))
        return result

    # -- secondary findings (:309-395) ---------------------------------------
    def generate_secondary_findings(self) -> list[str]:
        result = []
        ml_per_voxel = float(np.prod(self.spacing)) / 1000.0
        if AggregatableBodyPart.ABDOMEN in self.examined_body_part:
            vol = self._region_volume_ml(int(BodyRegion.ABDOMINAL_CAVITY))
            result.append(
                f"Total volume of the abdominal cavity is {_pretty_volume(vol)}")
        if AggregatableBodyPart.THORAX in self.examined_body_part:
            vol = self._region_volume_ml([int(BodyRegion.THORACIC_CAVITY),
                                          int(BodyRegion.MEDIASTINUM),
                                          int(BodyRegion.PERICARDIUM)])
            result.append(f"Volume of thoracic cavity is {_pretty_volume(vol)}")
            vol = self._region_volume_ml([int(BodyRegion.MEDIASTINUM),
                                          int(BodyRegion.PERICARDIUM)])
            result.append(f"Volume of mediastinum is {_pretty_volume(vol)}")
            vol = self._region_volume_ml(int(BodyRegion.PERICARDIUM))
            result.append("Volume enclosed by the pericardial sack is "
                          f"{_pretty_volume(vol)}")
            result.extend(self._breast_implant_findings(ml_per_voxel))
        return result

    def _breast_implant_findings(self, ml_per_voxel: float) -> list[str]:
        mask = self._regions == int(BodyRegion.BREAST_IMPLANT)
        if not mask.any():
            return []
        labels, n = cc.label(mask, connectivity=3)
        # ONE pass for all component volumes and x-centroids — a noisy
        # region map can have thousands of speckle components, and a
        # per-component full-volume scan is O(n * volume) (measured: >45
        # minutes on a synthetic 512x512x300 study)
        counts = np.bincount(labels.ravel(), minlength=n + 1).astype(np.float64)
        xs = np.arange(labels.shape[0], dtype=np.float64)[:, None, None]
        xsums = np.bincount(labels.ravel(),
                            weights=np.broadcast_to(
                                xs, labels.shape).ravel(),
                            minlength=n + 1)
        implants = []
        mid = self._regions.shape[0] // 2
        for comp in range(1, n + 1):
            vol = counts[comp] * ml_per_voxel
            if vol <= 10:
                continue
            cx = xsums[comp] / counts[comp]
            implants.append((cx, vol))
        if not implants:
            return []  # only speckle below the 10 mL filter: no finding
        # reference sorts by ascending LPS x = patient-RIGHT first; in RAS
        # (+x = Right) that is DESCENDING x
        implants.sort(key=lambda t: -t[0])
        named = [("right" if cx >= mid else "left", vol) for cx, vol in implants]
        if len(named) == 1:
            return [f"Patient has a single breast implant on the {named[0][0]} "
                    f"side with volume of {_pretty_volume(named[0][1])}"]
        if len(named) == 2:
            return [f"Patient has two breast implants with volume of "
                    f"{_pretty_volume(named[0][1])} ({named[0][0]}) and "
                    f"{_pretty_volume(named[1][1])} ({named[1][0]})"]
        logger.error("More than two breast implant segments found")
        return []

    # -- prepare + JSON (:397-598) -------------------------------------------
    def prepare(self, vertebrae=None, total=None,
                total_measurements: dict | None = None) -> dict[str, Any]:
        df = self.slicewise_measurements()
        df_nl = self.slicewise_measurements_no_limbs()
        aggregations = self.generate_aggregated_measurements(vertebrae)

        if (total_measurements is None or "segmentations" not in total_measurements
                or "total" not in total_measurements["segmentations"]):
            df_total = None
        else:
            df_total = pd.DataFrame(
                total_measurements["segmentations"]["total"]).T
            df_total = df_total.loc[df_total["present"].fillna(False).astype(bool)]
            df_total = df_total.drop(columns="present")
            df_total = df_total.rename(
                index={v: v.replace("_", " ").title() for v in df_total.index},
                columns={"25th_percentile_hu": "twentyfive_percentile_hu",
                         "75th_percentile_hu": "seventyfive_percentile_hu"})

        # fetch the PDF overlay CT slices HERE: prepare runs on the main
        # thread, while create_pdf may run on the HostWorker — device
        # dispatch (a device-resident self._ct) must stay main-thread-only
        # (utils/stages.py invariant)
        nz = self._regions.shape[2]
        chk = np.linspace(0, nz - 1, min(12, nz)).round().astype(np.int64)
        mids = [int((lo + hi) // 2) for _, (lo, hi), *_ in aggregations]
        all_idx = np.concatenate([chk, np.asarray(mids, np.int64)])
        # xy-downsample the overlay panels: ~18 full-res imshow rasters
        # cost seconds of the single host core (the PDF renders on the
        # HostWorker, contending with main-thread stages) and 4x the
        # tunnel bytes, for no visual-check value
        ds = max(1, min(self._regions.shape[0], self._regions.shape[1]) // 256)
        if self._tissues is not None:
            tissue_slices = self._tissues[::ds, ::ds, all_idx]
        else:  # host map deferred to the worker: gather the ~0.4 MB of
            #    panel slices from the device copy instead
            import jax.numpy as jnp

            tissue_slices = np.asarray(jnp.take(
                self._tissues_dev[::ds, ::ds], jnp.asarray(all_idx), axis=2))
        slice_check = {
            "check_idxs": chk,
            "mid_idxs": mids,
            "ct_slices": self.axial_ct_slices(all_idx, stride=ds),
            "tissue_slices": tissue_slices,
        }

        # heatmap density stacks for the PDF's page 2 — on device when the
        # host tissue map is deferred (the render runs on the HostWorker,
        # which must not dispatch device ops)
        if self._tissues is not None:
            from boa_tpu.bca import plots as _plots

            density = {ax: _plots.tissue_densities(self._tissues, ax)
                       for ax in (1, 0)}
        else:
            density = {ax: np.asarray(
                _tissue_density_pass(self._tissues_dev, ax))
                for ax in (1, 0)}

        return {
            "tissue_density": density,
            "aggregated_measurements": aggregations,
            "equidistant_slice_check": slice_check,
            "image_summary": None,
            "other_findings": self.generate_secondary_findings(),
            "slicewise_measurements": df,
            "slicewise_measurements_no_limbs": df_nl,
            "measurements_total": df_total,
            "tissue_heatmaps": None,
            "summary_totalsegmentator": None,
        }

    def create_json(self, **kwargs: Any) -> dict[str, Any]:
        def _rename_stats(stats: pd.DataFrame) -> dict:
            return stats.rename(
                index={"Mean": "mean", "StdDev": "std", "Minimum": "min",
                       "25%": "q1", "Median": "q2", "75%": "q3",
                       "Maximum": "max", "Total": "sum", "MeanHU": "mean_hu"},
                columns={x: x.lower() for x in stats.columns}).to_dict()

        return {
            "slices": (kwargs["slicewise_measurements"]
                       .rename(columns=str.lower).drop("slice_idx", axis=1)
                       .astype(float).to_dict("records")),
            "slices_no_extremities": (kwargs["slicewise_measurements_no_limbs"]
                                      .rename(columns=str.lower)
                                      .drop("slice_idx", axis=1)
                                      .astype(float).to_dict("records")),
            "aggregated": {
                name.lower().replace(" ", "_").replace("-", "_"): {
                    "num_slices": int(hi - lo),
                    "min_slice_idx": int(lo),
                    "max_slice_idx": int(hi),
                    "measurements": _rename_stats(stats),
                    "measurements_no_extremities": _rename_stats(stats_nl),
                }
                for name, (lo, hi), _, stats, stats_nl
                in kwargs["aggregated_measurements"]
            },
            "body_parts": {
                "abdomen": AggregatableBodyPart.ABDOMEN in self.examined_body_part,
                "neck": AggregatableBodyPart.NECK in self.examined_body_part,
                "thorax": AggregatableBodyPart.THORAX in self.examined_body_part,
            },
        }

    # -- PDF (:140-161; weasyprint replaced by matplotlib) -------------------
    def create_pdf(self, **prepared) -> bytes:
        from boa_tpu.bca.plots import render_report_pdf

        return render_report_pdf(self, prepared, version=__version__)


def create_vertebrae_info(total_seg: np.ndarray,
                          detected_body_part: AggregatableBodyPart,
                          class_map_total: dict[int, str]) -> dict[str, tuple[int, int]]:
    """Per-vertebra z slice ranges (`commands.py:24-45`)."""
    vertebrae_map = {name.removeprefix("vertebrae_"): idx
                     for idx, name in class_map_total.items()
                     if name.startswith("vertebrae_")}
    if not vertebrae_map:
        return {}
    # vertebra voxels are a tiny fraction of the scan: one range-mask pass
    # + flatnonzero, then a bincount over only those voxels (a full-volume
    # combined-key pass costs ~5 int32 volume copies on this host)
    nz = total_seg.shape[2]
    vals = sorted(vertebrae_map.values())
    vmin, vmax = vals[0], vals[-1]
    width = vmax - vmin + 1
    lib = native.get_lib()
    if lib is not None and hasattr(lib, "boa_label_z_presence") and \
            total_seg.dtype == np.uint8 and total_seg.ndim == 3 and \
            total_seg.flags.c_contiguous:
        # single read pass with a cache-resident (nz, width) table — the
        # numpy form below walks ~3 volume-sized temps (~5 s on this host)
        pres_u8 = np.empty((nz, width), np.uint8)
        lib.boa_label_z_presence(
            total_seg.ctypes.data, *[int(s) for s in total_seg.shape],
            int(vmin), int(vmax), pres_u8.ctypes.data)
        presence = pres_u8 != 0
    else:
        seg_flat = np.ascontiguousarray(total_seg).ravel()
        hits = np.flatnonzero((seg_flat >= vmin) & (seg_flat <= vmax))
        z = (hits % nz).astype(np.int64)
        lab = seg_flat[hits].astype(np.int64) - vmin
        presence = np.bincount(z * width + lab, minlength=nz * width
                               ).reshape(nz, width) > 0
    info: dict[str, tuple[int, int]] = {}
    for vid, label in vertebrae_map.items():
        zs = np.where(presence[:, label - vmin])[0]
        if len(zs) == 0:
            continue
        if (("C" in vid and AggregatableBodyPart.NECK not in detected_body_part)
                or ("T" in vid and AggregatableBodyPart.THORAX not in detected_body_part)
                or ("L" in vid and AggregatableBodyPart.ABDOMEN not in detected_body_part)):
            continue
        info[vid] = (int(zs.min()), int(zs.max() + 1))
    return info
