"""BCA report rendering: PDF via matplotlib.

The reference renders its PDF with Jinja2 -> WeasyPrint (native pango/cairo)
and plots with plotly+kaleido / fury-VTK (`report/plots/*`, `builder.py:
140-161`); none of those are available here. The PDF carries the same
content: tissue summary curves, coronal/sagittal tissue heatmaps, aggregated
measurement tables, secondary findings. Fixed tissue colors follow
`report/plots/colors.py:8-29`.
"""

from __future__ import annotations

import io
from typing import Any

import numpy as np

from boa_tpu.bca.definitions import Tissue

# fixed color map per tissue (report/plots/colors.py)
TISSUE_COLORS = {
    "Muscle": "#e41a1c",
    "Bone": "#f5f5f5",
    "SAT": "#ffff33",
    "VAT": "#ff7f00",
    "IMAT": "#984ea3",
    "PAT": "#4daf4a",
    "EAT": "#377eb8",
    "TAT": "#a65628",
}


def tissue_densities(tissues: np.ndarray, axis: int) -> np.ndarray:
    """(n_tissues, h, w) float32 density fractions of each Tissue along
    `axis`. measured: the 7 SIMD compare+reduce passes cost ~0.8 s/axis
    here, ~10x FASTER than a combined-key np.bincount (whose int64 key
    build alone writes a 630 MB temp) — the "one bincount pass" host rule
    applies to per-label work with large label counts, not 7 tissues."""
    depth = tissues.shape[axis]
    return np.stack([(tissues == int(t)).sum(axis=axis,
                                             dtype=np.float32) / depth
                     for t in Tissue])


def heatmap_rgb(density: np.ndarray) -> np.ndarray:
    """Colorize a (n_tissues, h, w) density stack (tissue_densities or the
    device-side twin in bca/report.py) with the fixed tissue colors."""
    import matplotlib

    rgb = np.zeros((*density.shape[1:], 3))
    for i, t in enumerate(Tissue):
        name = t.name.capitalize() if t in (Tissue.BONE, Tissue.MUSCLE) else t.name
        color = np.array(matplotlib.colors.to_rgb(TISSUE_COLORS[name]))
        rgb += density[i][..., None] * color[None, None]
    return np.clip(rgb, 0, 1)


def tissue_heatmap(tissues: np.ndarray, axis: int) -> np.ndarray:
    """Density projection of each tissue along `axis` (coronal: y, sagittal:
    x), parity in spirit with `report/plots/heatmaps.py:29-101`."""
    return heatmap_rgb(tissue_densities(tissues, axis))


def axial_overlay(ct_slices: np.ndarray, tis_slices: np.ndarray) -> np.ndarray:
    """Soft-tissue-windowed CT with alpha-blended tissue colors,
    (x, y, n[, 3]) -> (x, y, n, 3). The reference's slice-check strips and
    aggregation overlay images (`report/plots/*`) carry the same content."""
    import matplotlib

    g = np.clip((ct_slices.astype(np.float32) + 150.0) / 400.0, 0.0, 1.0)
    rgb = np.repeat(g[..., None], 3, axis=-1)
    for t in Tissue:
        name = t.name.capitalize() if t in (Tissue.BONE, Tissue.MUSCLE) else t.name
        color = np.asarray(matplotlib.colors.to_rgb(TISSUE_COLORS[name]),
                           np.float32)
        m = tis_slices == int(t)
        rgb[m] = 0.45 * rgb[m] + 0.55 * color
    return rgb


def render_report_pdf(builder, prepared: dict[str, Any], version: str) -> bytes:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.backends.backend_pdf import PdfPages

    dark = builder.theme == "dark"
    face = "#1c1c1c" if dark else "white"
    txt = "white" if dark else "black"
    buf = io.BytesIO()
    df = prepared["slicewise_measurements"]

    with PdfPages(buf) as pdf:
        # page 1: summary curves + findings
        fig, axes = plt.subplots(2, 1, figsize=(8.3, 11.7), facecolor=face,
                                 height_ratios=[2, 1])
        ax = axes[0]
        ax.set_facecolor(face)
        for col in ["Muscle", "TAT", "SAT", "VAT", "IMAT", "PAT", "EAT", "Bone"]:
            ax.plot(df["slice_idx"], df[col], label=col,
                    color=TISSUE_COLORS[col], lw=1.2)
        ax.set_xlabel("slice index", color=txt)
        ax.set_ylabel("volume per slice [ml]", color=txt)
        ax.set_title(f"Body Composition Analysis (boa-tpu {version})", color=txt)
        ax.tick_params(colors=txt)
        ax.legend(loc="upper right", fontsize=7)
        ax2 = axes[1]
        ax2.set_facecolor(face)
        ax2.axis("off")
        findings = prepared.get("other_findings") or ["No secondary findings."]
        ax2.text(0.02, 0.95, "Secondary findings:\n" + "\n".join(
            f"  • {f}" for f in findings), va="top", fontsize=9, color=txt)
        pdf.savefig(fig, facecolor=face)
        plt.close(fig)

        # page 2: heatmaps (densities precomputed by Builder.prepare on the
        # main thread — from the device tissue map when the host one is
        # still being rebuilt on the worker)
        fig, axes = plt.subplots(1, 2, figsize=(8.3, 11.7), facecolor=face)
        densities = prepared["tissue_density"]
        for ax, (axis, name) in zip(axes, [(1, "coronal"), (0, "sagittal")]):
            hm = heatmap_rgb(densities[axis])
            ax.imshow(np.rot90(hm), interpolation="nearest", aspect="auto")
            ax.set_title(f"{name} tissue heatmap", color=txt)
            ax.axis("off")
        pdf.savefig(fig, facecolor=face)
        plt.close(fig)

        # page 3: equidistant slice-check strip (reference: slice-check
        # images, `report/plots/*`) — CT + tissue overlay at 12 positions.
        # The slices were fetched by Builder.prepare on the MAIN thread
        # (this renderer may run on the HostWorker; device dispatch must
        # not happen here — utils/stages.py invariant).
        sc = prepared["equidistant_slice_check"]
        chk, mids = sc["check_idxs"], sc["mid_idxs"]
        n_chk = len(chk)
        aggs = prepared["aggregated_measurements"]
        overlays = axial_overlay(sc["ct_slices"], sc["tissue_slices"])
        fig, axes3 = plt.subplots(3, 4, figsize=(8.3, 11.7), facecolor=face)
        for k, ax in enumerate(axes3.ravel()):
            ax.axis("off")
            if k < n_chk:
                ax.imshow(np.rot90(overlays[:, :, k]),
                          interpolation="nearest", aspect="auto")
                ax.set_title(f"slice {int(chk[k])}", color=txt, fontsize=8)
        fig.suptitle("Slice check — tissue overlay", color=txt)
        pdf.savefig(fig, facecolor=face)
        plt.close(fig)

        # page 4+: aggregated tables — with AND without extremities (the
        # reference report carries both per body region) plus the window's
        # mid-slice overlay image (reference: aggregation overlay images)
        def _draw_table(ax, frame, title):
            ax.axis("off")
            ax.set_title(title, color=txt)
            cell_text = [[f"{v:.2f}" if isinstance(v, (int, float)) and v is not None
                          else "-" for v in row]
                         for row in frame.itertuples(index=False)]
            table = ax.table(cellText=cell_text, rowLabels=list(frame.index),
                             colLabels=list(frame.columns),
                             loc="upper center")
            table.auto_set_font_size(False)
            table.set_fontsize(7)

        for j, (name, (lo, hi), _, stats, stats_nl) in enumerate(aggs):
            fig, axes2 = plt.subplots(
                3, 1, figsize=(8.3, 11.7), facecolor=face,
                height_ratios=[4, 4, 3])
            _draw_table(axes2[0], stats, f"{name} (slices {lo}-{hi})")
            _draw_table(axes2[1], stats_nl, f"{name} — NoExtremities")
            axes2[2].axis("off")
            axes2[2].imshow(np.rot90(overlays[:, :, n_chk + j]),
                            interpolation="nearest", aspect="auto")
            axes2[2].set_title(f"mid slice {mids[j]}", color=txt, fontsize=8)
            pdf.savefig(fig, facecolor=face)
            plt.close(fig)

    return buf.getvalue()
