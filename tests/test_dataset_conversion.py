"""Dataset conversion + model sharing (nnUNetv2_convert_MSD_dataset,
generate_dataset_json, nnUNetv2_export_model_to_zip/install)."""

from __future__ import annotations

import json
import zipfile
from pathlib import Path

import numpy as np
import pytest

from boa_tpu.engine.dataset_conversion import (convert_msd_dataset,
                                               generate_dataset_json,
                                               split_4d_nifti)
from boa_tpu.io import nifti
from boa_tpu.weights.sharing import (export_pretrained_model,
                                     install_model_from_zip)
from boa_tpu.weights.store import ModelStore, create_synthetic_model


def test_generate_dataset_json(tmp_path):
    ds = generate_dataset_json(
        tmp_path, {0: "CT"}, {"background": 0, "liver": 1}, 7, ".nii.gz",
        dataset_name="Demo", description="x")
    on_disk = json.loads((tmp_path / "dataset.json").read_text())
    assert on_disk == ds
    assert ds["channel_names"] == {"0": "CT"}  # keys coerced to str
    assert ds["labels"]["liver"] == 1
    assert ds["numTraining"] == 7
    assert ds["name"] == "Demo"


def test_generate_dataset_json_regions_need_order(tmp_path):
    with pytest.raises(ValueError, match="regions_class_order"):
        generate_dataset_json(
            tmp_path, {0: "CT"},
            {"background": 0, "whole": (1, 2), "core": 2}, 3, ".nii.gz")
    ds = generate_dataset_json(
        tmp_path, {0: "CT"},
        {"background": 0, "whole": (1, 2), "core": 2}, 3, ".nii.gz",
        regions_class_order=(1, 2))
    assert ds["labels"]["whole"] == (1, 2)
    assert ds["regions_class_order"] == [1, 2]


def _write_case(path: Path, shape, seed=0, dtype=np.int16):
    path.parent.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    data = rng.integers(-100, 200, size=shape).astype(dtype)
    nifti.save(nifti.NiftiImage(data=data, affine=np.eye(4)), path)
    return data


def test_split_4d_nifti(tmp_path):
    four_d = tmp_path / "case_01.nii.gz"
    data = _write_case(four_d, (6, 5, 4, 2))
    outs = split_4d_nifti(four_d, tmp_path / "out")
    assert [o.name for o in outs] == ["case_01_0000.nii.gz",
                                      "case_01_0001.nii.gz"]
    for c, o in enumerate(outs):
        np.testing.assert_array_equal(nifti.load(o).data, data[..., c])

    three_d = tmp_path / "case_02.nii.gz"
    data3 = _write_case(three_d, (6, 5, 4), seed=1)
    (out3,) = split_4d_nifti(three_d, tmp_path / "out")
    assert out3.name == "case_02_0000.nii.gz"
    np.testing.assert_array_equal(nifti.load(out3).data, data3)


def _make_msd_task(root: Path, n_channels=2) -> Path:
    src = root / "Task05_Prostate"
    for cid in ("prostate_00", "prostate_01"):
        shape = (6, 5, 4, n_channels) if n_channels > 1 else (6, 5, 4)
        _write_case(src / "imagesTr" / f"{cid}.nii.gz", shape,
                    seed=hash(cid) % 1000)
        seg = np.zeros((6, 5, 4), np.uint8)
        seg[2:4, 2:4, 1:3] = 1
        (src / "labelsTr").mkdir(parents=True, exist_ok=True)
        nifti.save(nifti.NiftiImage(data=seg, affine=np.eye(4)),
                   src / "labelsTr" / f"{cid}.nii.gz")
    _write_case(src / "imagesTs" / "prostate_02.nii.gz",
                (6, 5, 4, n_channels), seed=42)
    # hidden/system files must be skipped like the reference does
    (src / "imagesTr" / "._junk.nii.gz").write_bytes(b"not a nifti")
    (src / "dataset.json").write_text(json.dumps({
        "name": "Prostate",
        "modality": {"0": "T2", "1": "ADC"},
        "labels": {"0": "background", "1": "peripheral zone"},
        "training": [{"image": "./imagesTr/prostate_00.nii.gz",
                      "label": "./labelsTr/prostate_00.nii.gz"}],
        "test": ["./imagesTs/prostate_02.nii.gz"],
    }))
    return src


def test_convert_msd_dataset(tmp_path):
    src = _make_msd_task(tmp_path)
    raw = tmp_path / "raw"
    target = convert_msd_dataset(src, raw_root=raw)
    assert target == raw / "Dataset005_Prostate"
    # channels split per case, labels copied unsplit
    names = sorted(p.name for p in (target / "imagesTr").iterdir())
    assert names == ["prostate_00_0000.nii.gz", "prostate_00_0001.nii.gz",
                     "prostate_01_0000.nii.gz", "prostate_01_0001.nii.gz"]
    assert sorted(p.name for p in (target / "imagesTs").iterdir()) == [
        "prostate_02_0000.nii.gz", "prostate_02_0001.nii.gz"]
    assert sorted(p.name for p in (target / "labelsTr").iterdir()) == [
        "prostate_00.nii.gz", "prostate_01.nii.gz"]
    ds = json.loads((target / "dataset.json").read_text())
    assert ds["labels"] == {"background": 0, "peripheral zone": 1}
    assert ds["channel_names"] == {"0": "T2", "1": "ADC"}
    assert ds["file_ending"] == ".nii.gz"
    assert "training" not in ds and "test" not in ds and "modality" not in ds

    # id collision refused unless renumbered
    with pytest.raises(FileExistsError):
        convert_msd_dataset(src, raw_root=raw)
    t2 = convert_msd_dataset(src, overwrite_target_id=201, raw_root=raw)
    assert t2.name == "Dataset201_Prostate"


def test_export_install_roundtrip(tmp_path):
    store_a = tmp_path / "store_a"
    create_synthetic_model(store_a, 991, "demo", num_classes=3, n_folds=2)
    zpath = export_pretrained_model(
        991, tmp_path / "model.zip", folds=(0, 1), root=store_a)
    members = zipfile.ZipFile(zpath).namelist()
    assert any(m.endswith("fold_0/checkpoint_final.npz") for m in members)
    assert any(m.endswith("plans.json") for m in members)

    store_b = tmp_path / "store_b"
    install_model_from_zip(zpath, root=store_b)
    plans, params = ModelStore(store_b).load(991, folds=(0, 1))
    assert len(params) == 2
    assert plans.arch_config().num_classes == 3

    # strict export of a missing configuration fails loudly
    with pytest.raises(FileNotFoundError):
        export_pretrained_model(991, tmp_path / "x.zip",
                                configurations=("2d",), folds=(0,),
                                root=store_a)


def test_install_rejects_zip_slip(tmp_path):
    evil = tmp_path / "evil.zip"
    with zipfile.ZipFile(evil, "w") as zf:
        zf.writestr("../outside.txt", "nope")
    with pytest.raises(ValueError, match="unsafe"):
        install_model_from_zip(evil, root=tmp_path / "store")
    assert not (tmp_path / "outside.txt").exists()
