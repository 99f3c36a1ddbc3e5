"""Real CLI end-to-end through a subprocess with synthetic weights.

Parity: `tests/test_cli.py:24-70` of the reference (runs the actual CLI
twice against a downloaded series). Here the series is synthetic and the
weights are random at a tiny architecture — the full flag/env/orchestration
path is exercised, including env-var mirrors.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from boa_tpu.io import nifti
from boa_tpu.weights.store import create_synthetic_model

pytestmark = pytest.mark.integration


def test_cli_subprocess_end_to_end(tmp_path):
    wroot = tmp_path / "weights"
    create_synthetic_model(
        wroot, 297, "fast", num_classes=5,
        trainer="nnUNetTrainer_4000epochs_NoMirroring",
        patch_size=(16, 16, 16), spacing=(3.0, 3.0, 3.0), features=(4, 8))

    data = np.full((40, 36, 32), -1000, np.int16)
    data[8:32, 8:28, :] = 40
    img = nifti.NiftiImage(data=data, affine=np.diag([-1.5, -1.5, 3.0, 1.0]))
    study = tmp_path / "study.nii.gz"
    nifti.save(img, study)

    out = tmp_path / "out"
    env = dict(os.environ)
    env.update(BOA_WEIGHTS_PATH=str(wroot), JAX_PLATFORMS="cpu",
               SKIP_CONTRAST_INFORMATION="1", BCA_NO_PDF="1",
               BOA_TPU_CONFIG_DIR=str(tmp_path / "cfg"))
    # env mirrors: --skip-contrast-information and --bca-no-pdf via env
    proc = subprocess.run(
        [sys.executable, "-m", "boa_tpu", "-i", str(study), "-o", str(out),
         "-m", "total", "--fast-total", "--verbose"],
        cwd=Path(__file__).resolve().parent.parent,
        env=env, capture_output=True, text=True, timeout=840)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert (out / "output.xlsx").exists()
    assert (out / "total.nii.gz").exists()
    assert (out / "debug_information.txt").exists()
    seg = nifti.load(out / "total.nii.gz")
    assert seg.shape == (40, 36, 32)


def test_cli_bca_cnr_dark_theme(tmp_path):
    """Second reference-CI combo (`tests/test_cli.py:24-70` run 1):
    BCA + --cnr-adjustment + --theme dark through the real CLI, with the
    workbook's cnr-adjusted sheet pinned against a committed golden the way
    the reference CI pins its Excel (`tests/test_results.py:18-28`).

    Segmentations come from the anatomy phantom via the BOA_TEST_ANATOMY
    hook (the reference's `test=N` fake-inference mode,
    `totalsegmentator/nnunet.py:560-578`): deterministic aorta/autochthon
    labels with plausible HU, so the sheet exists and its numbers are
    reproducible — random tiny weights never emit the autochthon classes
    the CNR reference needs."""
    from boa_tpu.testing.anatomy import synth_ct

    shape, spacing = (160, 160, 48), (2.5, 2.5, 6.0)
    # RAS affine: the anatomy hook paints labels in the canonical frame, so
    # a pre-canonical study keeps seg and CT geometry aligned (an LPS study
    # would mirror the labels against the HU content)
    affine = np.diag([spacing[0], spacing[1], spacing[2], 1.0])
    img = nifti.NiftiImage(data=synth_ct(shape=shape, spacing=spacing),
                           affine=affine)
    study = tmp_path / "study.nii.gz"
    nifti.save(img, study)

    out = tmp_path / "out"
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", SKIP_CONTRAST_INFORMATION="1",
               BOA_TEST_ANATOMY="1",
               BOA_TPU_CONFIG_DIR=str(tmp_path / "cfg"))
    proc = subprocess.run(
        [sys.executable, "-m", "boa_tpu", "-i", str(study), "-o", str(out),
         "-m", "total+bca", "--fast-total", "--fast-bca",
         "--cnr-adjustment", "--theme", "dark"],
        cwd=Path(__file__).resolve().parent.parent,
        env=env, capture_output=True, text=True, timeout=840)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert (out / "output.xlsx").exists()
    assert (out / "body_regions.nii.gz").exists()
    assert (out / "tissues.nii.gz").exists()
    assert (out / "report.pdf").exists()
    assert (out / "bca-measurements.json").exists()

    # numeric regression of the cnr-adjusted sheet against a committed
    # golden (the reference pins the same sheet with rtol=0.12,
    # `tests/test_results.py:18-28`); phantom labels + seeded noise make
    # the segmentation — and therefore the sheet — deterministic
    import pandas as pd

    from boa_tpu.io.xlsx import read_xlsx_sheet_df

    cnr = read_xlsx_sheet_df(out / "output.xlsx", "cnr-adjusted",
                             header_row=1)
    assert not cnr.empty, "cnr-adjusted sheet missing or empty"
    golden_path = Path(__file__).parent / "data" / "golden_cnr_adjusted.csv"
    if not golden_path.exists():  # first run: materialize the golden
        cnr.to_csv(golden_path, index=False)
        pytest.fail(f"golden {golden_path} was missing; wrote it — rerun")
    golden = pd.read_csv(golden_path)
    assert list(cnr["BodyRegion"]) == list(golden["BodyRegion"])
    num_cols = [c for c in golden.columns if c != "BodyRegion"]
    pd.testing.assert_frame_equal(
        cnr[num_cols].astype(float).reset_index(drop=True),
        golden[num_cols].astype(float).reset_index(drop=True),
        rtol=0.12)
