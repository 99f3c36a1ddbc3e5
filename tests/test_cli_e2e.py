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
    BCA + --cnr-adjustment + --theme dark through the real CLI."""
    from boa_tpu.bca.definitions import BodyPart, BodyRegion

    wroot = tmp_path / "weights"
    create_synthetic_model(
        wroot, 297, "fast", num_classes=5,
        trainer="nnUNetTrainer_4000epochs_NoMirroring",
        patch_size=(16, 16, 16), spacing=(3.0, 3.0, 3.0), features=(4, 8))
    create_synthetic_model(
        wroot, 542, "BCA_body_regions", num_classes=max(BodyRegion) + 1,
        trainer="nnUNetTrainerNoMirroring", patch_size=(16, 16, 8),
        spacing=(1.5, 1.5, 5.0), features=(4, 8),
        label_names=["background"] + [r.name for r in
                                      sorted(BodyRegion, key=int)])
    create_synthetic_model(
        wroot, 543, "BCA_body_parts", num_classes=max(BodyPart) + 1,
        trainer="nnUNetTrainer_1500epochs_NoMirroring",
        patch_size=(16, 16, 8), spacing=(1.5, 1.5, 5.0), features=(4, 8),
        label_names=["background"] + [r.name for r in
                                      sorted(BodyPart, key=int)])

    data = np.full((40, 36, 32), -1000, np.int16)
    data[8:32, 8:28, :] = 40
    img = nifti.NiftiImage(data=data, affine=np.diag([-1.5, -1.5, 3.0, 1.0]))
    study = tmp_path / "study.nii.gz"
    nifti.save(img, study)

    out = tmp_path / "out"
    env = dict(os.environ)
    env.update(BOA_WEIGHTS_PATH=str(wroot), JAX_PLATFORMS="cpu",
               SKIP_CONTRAST_INFORMATION="1",
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
    # the cnr-adjusted sheet requires the autochthon reference; with random
    # tiny weights it may be absent, but the run itself must succeed and
    # produce the workbook
