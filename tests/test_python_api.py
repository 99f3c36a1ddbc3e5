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
                                  ml=True, statistics=True,
                                  fake_predict=_fake)
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


def test_api_v1_order(study):
    """v1_order relabels total-task output into total_v1 ids by name."""
    from boa_tpu.tasks import class_maps

    seg_v2 = totalsegmentator(study, None, task="total", fast=True,
                              fake_predict=_fake)
    seg_v1 = totalsegmentator(study, None, task="total", fast=True,
                              v1_order=True, fake_predict=_fake)
    m2 = class_maps.get_class_map("total")
    m1 = class_maps.get_class_map("total_v1")
    inv1 = {v: k for k, v in m1.items()}
    d2, d1 = np.asarray(seg_v2.data), np.asarray(seg_v1.data)
    for lb in np.unique(d2):
        if lb == 0:
            continue
        expect = inv1.get(m2[int(lb)], 0)
        assert set(np.unique(d1[d2 == lb])) == {expect}
    assert seg_v1.get_label_map() == m1


def test_api_skip_saving_and_test_hook(study, tmp_path):
    out = tmp_path / "masks"
    seg = totalsegmentator(study, out, task="total", fast=True,
                           skip_saving=True, test=1)
    assert not out.exists()          # nothing written
    assert np.asarray(seg.data).max() == 1  # ellipsoid stand-in labeling


def test_api_remove_small_blobs(study):
    def speckled(vol, spacing, task_id):
        seg = _fake(vol, spacing, task_id)
        seg[0, 0, 0] = 1  # single-voxel blob, ~6.75 mm3 < 200 mm3
        return seg

    seg = totalsegmentator(study, None, task="total", fast=True,
                           remove_small_blobs=True, fake_predict=speckled)
    assert np.asarray(seg.data)[0, 0, 0] == 0


def test_api_save_probabilities(study, tmp_path):
    probs_path = tmp_path / "probs.npz"
    seg = totalsegmentator(study, None, task="total", fast=True,
                           save_probabilities=probs_path, fake_predict=_fake)
    import pickle

    assert probs_path.exists() and probs_path.with_suffix(".pkl").exists()
    probs = np.load(probs_path)["probabilities"]
    assert probs.dtype == np.float16 and probs.ndim == 4
    # fake path writes one-hot stand-ins: argmax reproduces the model-grid seg
    assert probs.shape[0] >= 2 and np.allclose(probs.sum(0), 1.0)
    with open(probs_path.with_suffix(".pkl"), "rb") as fh:
        props = pickle.load(fh)
    assert "spacing" in props


def test_api_crop_path_reuse(study, tmp_path):
    """A crop mask stored under crop_path is loaded instead of re-running
    the rough pre-pass (python_api.py crop_path reuse)."""
    img = nifti.load(study)
    mask = np.zeros(img.shape, np.uint8)
    mask[10:30, 10:26, 8:28] = 1
    crop_dir = tmp_path / "crops"
    crop_dir.mkdir()
    nifti.save(nifti.NiftiImage(data=mask, affine=img.affine.copy()),
               crop_dir / "crop_mask.nii.gz")

    calls = []

    def counting_fake(vol, spacing, task_id):
        calls.append(vol.shape)
        return _fake(vol, spacing, task_id)

    seg = totalsegmentator(study, None, task="total", fast=True,
                           crop_path=crop_dir, fake_predict=counting_fake)
    assert seg.shape == img.shape
    assert len(calls) == 1
    # the model saw (roughly) only the cropped extent, not the whole volume
    assert np.prod(calls[0]) < np.prod(img.shape)


def test_api_normalized_intensity_statistics(study):
    _, stats = totalsegmentator(study, None, task="total", fast=True,
                                statistics=True,
                                statistics_normalized_intensities=True,
                                fake_predict=_fake)
    vals = [e["intensity"] for e in stats.values() if e["volume"] > 0]
    assert vals and all(0.0 <= v <= 1.0 for v in vals)


def test_api_dicom_series_input_and_dicom_outputs(tmp_path):
    """DICOM directory in -> dicom_seg + dicom_rtstruct + nifti out."""
    from boa_tpu.io import dicom, dicom_io, dicom_seg

    data = np.full((32, 32, 12), -1000, np.int16)
    data[8:24, 8:24, :] = 40
    img = nifti.NiftiImage(data=data,
                           affine=np.diag([-1.0, -1.0, 3.0, 1.0]))
    dcm_dir = tmp_path / "dicoms"
    dcm_dir.mkdir()
    dicom_io.write_ct_series(img, dcm_dir)

    out = tmp_path / "out"
    totalsegmentator(dcm_dir, out, task="total", fast=True, ml=True,
                     output_type=["nifti", "dicom_seg", "dicom_rtstruct"],
                     fake_predict=_fake)
    assert (out / "total_segmentation.nii.gz").exists()
    seg_ds = dicom.dcmread(out / "total_segmentation_seg.dcm")
    labels, lmap = dicom_seg.read_seg_labelmap(seg_ds)
    assert set(np.unique(labels)) >= {0, 1}
    rt = dicom.dcmread(out / "total_segmentation_rtstruct.dcm")
    assert rt.get("StructureSetROISequence") is not None

    with pytest.raises(ValueError):  # nifti input cannot emit DICOM objects
        totalsegmentator(nifti.NiftiImage(data=data, affine=img.affine),
                         out, output_type="dicom_seg", fake_predict=_fake)


def test_api_derived_body_masks(tmp_path):
    """body task, per-class mode: body.nii.gz + skin.nii.gz derived
    (`nnunet.py:821-827`)."""
    data = np.full((40, 36, 20), -1000, np.int16)
    data[8:32, 8:28, :] = 40
    img = nifti.NiftiImage(data=data, affine=np.diag([1.5, 1.5, 3.0, 1.0]))
    p = tmp_path / "ct.nii.gz"
    nifti.save(img, p)

    def body_fake(vol, spacing, task_id):
        seg = np.zeros(vol.shape, np.uint8)
        seg[8:32, 8:28, :] = 1   # body_trunc
        seg[2:5, 2:5, :] = 2     # body_extremities
        return seg

    out = tmp_path / "masks"
    totalsegmentator(p, out, task="body", fake_predict=body_fake)
    assert (out / "body_trunc.nii.gz").exists()
    assert (out / "body.nii.gz").exists()
    skin = nifti.load(out / "skin.nii.gz")
    assert np.asarray(skin.data).sum() > 0

    out2 = tmp_path / "masks2"
    totalsegmentator(p, out2, task="body", no_derived_masks=True,
                     fake_predict=body_fake)
    assert not (out2 / "skin.nii.gz").exists()


def test_cli_total_segmentator(study, tmp_path, monkeypatch):
    """The TotalSegmentator CLI front-end drives the API end to end."""
    from boa_tpu.tools import total_segmentator as cli

    out = tmp_path / "seg.nii.gz"
    monkeypatch.setattr("boa_tpu.python_api._test_fake_predict", _fake)
    cli.main(["-i", str(study), "-o", str(out), "-ml", "-ta", "total",
              "--fast", "--test", "1", "--statistics", "-q"])
    assert out.exists()
    assert (tmp_path / "statistics.json").exists()


def test_cli_set_license_and_setup(tmp_path, monkeypatch):
    from boa_tpu.tools import set_license, setup_manually
    from boa_tpu.utils import persistent_config

    monkeypatch.setenv("BOA_TPU_CONFIG_DIR", str(tmp_path))
    set_license.main(["-l", "aca_00000000000000", "-sv"])
    assert persistent_config.get_license_number() == "aca_00000000000000"
    setup_manually.main(["-id", "totalseg_12345678"])
    assert persistent_config.get_config_key("boa_tpu_id") == \
        "totalseg_12345678"
    with pytest.raises(ValueError):
        set_license.main(["-l", "bad_license", "-sv"])
