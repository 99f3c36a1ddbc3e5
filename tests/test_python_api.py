"""`totalsegmentator()` public API wrapper."""

import json

import numpy as np
import pytest

from boa_tpu.io import nifti
from boa_tpu.python_api import totalsegmentator
from boa_tpu.weights.store import ModelStore, create_synthetic_model


@pytest.fixture()
def study(tmp_path):
    data = np.full((40, 36, 32), -1000, np.int16)
    data[8:32, 8:28, :] = 40
    img = nifti.NiftiImage(data=data, affine=np.diag([-1.5, -1.5, 3.0, 1.0]))
    p = tmp_path / "ct.nii.gz"
    nifti.save(img, p)
    return p


def _fake(vol, spacing, task_id):
    seg = np.zeros(vol.shape, np.uint8)
    nx, ny, nz = vol.shape
    seg[nx // 4:nx // 2, ny // 4:ny // 2, nz // 4:nz // 2] = 1   # spleen
    seg[nx // 2:3 * nx // 4, ny // 2:3 * ny // 4,
        nz // 4:3 * nz // 4] = 5  # liver
    return seg


def test_api_multilabel(study, tmp_path):
    out = tmp_path / "seg.nii.gz"
    seg, stats = totalsegmentator(study, out, task="total", fast=True,
                                  statistics=True, fake_predict=_fake)
    assert out.exists()
    assert stats["liver"]["volume"] > 0
    back = nifti.load(out)
    assert set(np.unique(back.data)) == {0, 1, 5}
    assert (tmp_path / "statistics.json").exists()


def test_api_binary_masks_and_roi_subset(study, tmp_path):
    out = tmp_path / "masks"
    totalsegmentator(study, out, task="total", fast=True, ml=False,
                     roi_subset=["liver"], fake_predict=_fake)
    assert (out / "liver.nii.gz").exists()
    assert not (out / "spleen.nii.gz").exists()
    liver = nifti.load(out / "liver.nii.gz")
    assert set(np.unique(liver.data)) == {0, 1}


def test_api_real_weights(tmp_path):
    store_dir = tmp_path / "w"
    create_synthetic_model(store_dir, 298, "fastest", num_classes=5,
                           trainer="nnUNetTrainer_4000epochs_NoMirroring",
                           patch_size=(16, 16, 16), spacing=(6.0, 6.0, 6.0),
                           features=(4, 8))
    data = np.full((40, 36, 32), -1000, np.int16)
    data[8:32, 8:28, :] = 40
    img = nifti.NiftiImage(data=data, affine=np.diag([-1.5, -1.5, 3.0, 1.0]))
    seg = totalsegmentator(img, None, task="total", fastest=True,
                           store=ModelStore(store_dir))
    assert seg.shape == img.shape


def test_api_license_gate(study, capsys):
    import os

    os.environ.pop("LICENSE_NUMBER", None)
    with pytest.raises(SystemExit):
        totalsegmentator(study, None, task="heartchambers_highres",
                         fake_predict=_fake)
