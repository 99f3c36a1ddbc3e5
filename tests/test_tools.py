"""bin-tool equivalents: phase mapping, modality, combine-masks, Evans
index, weights manager CLI, full task-registry coverage."""

import numpy as np
import pytest

from boa_tpu.io import nifti
from boa_tpu.tasks import class_maps
from boa_tpu.tasks.registry import BCA_TASKS, TASKS, get_task
from boa_tpu.tools.combine_masks import (combine_masks,
                                         combine_masks_to_multilabel_file)
from boa_tpu.tools.evans_index import evans_index, max_diameter_x
from boa_tpu.tools.get_modality import get_modality
from boa_tpu.tools.get_phase import (features_from_stats,
                                     get_ct_contrast_phase,
                                     pi_time_to_phase)


def test_pi_time_to_phase_table():
    # exact reference mapping (totalseg_get_phase.py:23-55)
    assert pi_time_to_phase(2) == ("native", 1.0)
    assert pi_time_to_phase(7) == ("native", 0.7)
    assert pi_time_to_phase(15) == ("arterial_early", 0.7)
    assert pi_time_to_phase(25) == ("arterial_early", 1.0)
    assert pi_time_to_phase(40) == ("arterial_late", 1.0)
    assert pi_time_to_phase(55) == ("arterial_late", 0.7)
    assert pi_time_to_phase(75) == ("portal_venous", 1.0)
    assert pi_time_to_phase(95) == ("portal_venous", 0.7)
    assert pi_time_to_phase(150) == ("portal_venous", 0.3)


def test_get_phase_heuristic():
    # "heuristic" explicitly opts out of the trained models; a MISSING
    # model path must raise, never silently degrade
    stats = {"aorta": {"intensity": 300}, "portal_vein_and_splenic_vein":
             {"intensity": 120}, "liver": {"intensity": 60}}
    res = get_ct_contrast_phase(stats, model_file="heuristic")
    assert res["phase"] == "arterial_early"
    stats2 = {"aorta": {"intensity": 60}}
    assert get_ct_contrast_phase(
        stats2, model_file="heuristic")["phase"] == "native"
    with pytest.raises(FileNotFoundError):
        get_ct_contrast_phase(stats, model_file="/nonexistent.pkl")
    feats = features_from_stats(stats)
    assert feats["aorta"] == 300 and feats["brain"] == 0.0


def test_get_phase_vendored_regressors():
    """The vendored reference pi-time XGBoost folds drive the default
    path (parity: totalseg_get_phase.py:57-120 + resources pickle)."""
    from boa_tpu.tools.get_phase import _VENDORED_PHASE_PKL

    assert _VENDORED_PHASE_PKL.exists()
    # native study: unenhanced blood pool everywhere
    native = {o: {"intensity": v} for o, v in {
        "liver": 55, "pancreas": 45, "urinary_bladder": 10,
        "gallbladder": 15, "heart": 40, "aorta": 45,
        "inferior_vena_cava": 40, "portal_vein_and_splenic_vein": 40,
        "iliac_vena_left": 40, "iliac_vena_right": 40,
        "iliac_artery_left": 45, "iliac_artery_right": 45,
        "pulmonary_vein": 40, "brain": 35, "colon": 30,
        "small_bowel": 30}.items()}
    res = get_ct_contrast_phase(native)
    assert res["phase"] == "native"
    assert res["pi_time_min"] <= res["pi_time"] <= res["pi_time_max"]
    # strong arterial enhancement, portal system still dark
    arterial = {**native, "aorta": {"intensity": 350},
                "iliac_artery_left": {"intensity": 300},
                "iliac_artery_right": {"intensity": 300},
                "heart": {"intensity": 250}}
    res2 = get_ct_contrast_phase(arterial)
    assert res2["phase"].startswith("arterial")
    assert res2["pi_time"] > res["pi_time"]


def test_get_modality_heuristic(rng):
    ct = rng.normal(40, 300, (20, 20, 20)).astype(np.float32)
    ct[0:5] = -1000
    assert get_modality(ct)["modality"] == "ct"
    mr = np.abs(rng.normal(400, 150, (20, 20, 20))).astype(np.float32)
    assert get_modality(mr)["modality"] == "mr"


def test_get_modality_vendored_classifier(rng):
    """The vendored XGBoost folds are decoded (UBJSON) and scored by the
    numpy tree walker; CT/MR separation matches the reference classifier
    (totalseg_get_modality.py:49-60 ensemble semantics)."""
    from boa_tpu.tools.get_modality import _vendored_ensemble

    folds = _vendored_ensemble()
    assert folds is not None and len(folds) == 5
    assert all(f.objective == "binary:logistic" for f in folds)
    assert folds[0].feature_names == ["mean", "std", "min", "max"]
    ct = rng.normal(40, 300, (20, 20, 20)).astype(np.float32)
    ct[0:5] = -1000
    res = get_modality(ct)
    assert res["modality"] == "ct" and res["probability"] >= 0.8
    mr = np.abs(rng.normal(400, 150, (20, 20, 20))).astype(np.float32)
    res2 = get_modality(mr)
    assert res2["modality"] == "mr" and res2["probability"] >= 0.8


def test_combine_masks_multilabel(tmp_path):
    cmap = class_maps.get_class_map("total")
    inv = {v: k for k, v in cmap.items()}
    seg = np.zeros((16, 16, 16), np.uint8)
    seg[2:6] = inv["lung_upper_lobe_left"]
    seg[8:12] = inv["liver"]
    img = nifti.NiftiImage(data=seg, affine=np.eye(4))
    img.set_label_map(cmap)
    p = tmp_path / "total.nii.gz"
    nifti.save(img, p)
    lung = combine_masks(p, "lung")
    assert lung.data[3, 0, 0] == 1 and lung.data[9, 0, 0] == 0


def test_combine_masks_dir_and_multilabel_file(tmp_path):
    affine = np.eye(4)
    shape = (10, 10, 10)
    for name, sl in [("liver", np.s_[1:4]), ("spleen", np.s_[6:9])]:
        m = np.zeros(shape, np.uint8)
        m[sl] = 1
        nifti.save(nifti.NiftiImage(data=m, affine=affine),
                   tmp_path / f"{name}.nii.gz")
    out = combine_masks(tmp_path, ["liver", "spleen"])
    assert out.data[2, 0, 0] == 1 and out.data[7, 0, 0] == 1
    combine_masks_to_multilabel_file(tmp_path, tmp_path / "multi.nii.gz")
    ml = nifti.load(tmp_path / "multi.nii.gz")
    cmap = class_maps.get_class_map("total")
    inv = {v: k for k, v in cmap.items()}
    assert ml.data[2, 0, 0] == inv["liver"]
    assert ml.data[7, 0, 0] == inv["spleen"]


def test_max_diameter_x():
    m = np.zeros((20, 10, 5), bool)
    m[3:15, 4, 2] = True   # 11-voxel x-extent at z=2
    m[5:8, 2, 1] = True
    d, (start, end) = max_diameter_x(m)
    assert d == 11
    assert start == [3, 4, 2] and end == [14, 4, 2]


def test_evans_index(tmp_path):
    vent = np.zeros((40, 40, 10), np.uint8)
    label_map = {1: "frontal_horn_left", 2: "frontal_horn_right",
                 3: "occipital_horn_left"}
    vent[12:19, 20, 5] = 1
    vent[21:28, 20, 5] = 2   # horns span x=12..27 -> diameter 15
    brain = np.zeros((40, 40, 10), bool)
    brain[5:35, 10:30, :] = True  # diameter 29
    res = evans_index(vent, label_map, brain, (1.0, 1.0, 5.0),
                      plot_file=tmp_path / "evans.png")
    assert res["success"]
    assert res["evans_index"] == pytest.approx(15 / 29, abs=1e-3)
    assert (tmp_path / "evans.png").exists()


def test_evans_index_empty():
    res = evans_index(np.zeros((5, 5, 5), np.uint8), {}, np.zeros((5, 5, 5),
                      bool), (1, 1, 1))
    assert not res["success"]


def test_registry_covers_reference_tasks():
    """Every public CT/MR task of python_api.py:168-624 is registered."""
    expected = {
        "total", "total_fast", "total_fastest", "total_mr", "total_highres_test",
        "lung_vessels", "cerebral_bleed", "hip_implant", "body", "body_mr",
        "vertebrae_mr", "pleural_pericard_effusion", "liver_vessels",
        "head_glands_cavities", "headneck_bones_vessels", "head_muscles",
        "headneck_muscles", "oculomotor_muscles", "lung_nodules",
        "kidney_cysts", "breasts", "ventricle_parts", "liver_segments",
        "liver_segments_mr", "craniofacial_structures", "abdominal_muscles",
        "teeth", "trunk_cavities", "brain_aneurysm", "vertebrae_body",
        "heartchambers_highres", "appendicular_bones",
        "appendicular_bones_mr", "tissue_types", "tissue_types_mr",
        "tissue_4_types", "face", "face_mr", "brain_structures",
        "thigh_shoulder_muscles", "thigh_shoulder_muscles_mr",
        "coronary_arteries", "aortic_sinuses",
    }
    missing = expected - set(TASKS)
    assert not missing, f"missing tasks: {sorted(missing)}"
    # every registered task has a class map (label semantics available)
    from boa_tpu.inference.pipeline import class_map_for_task

    for name in expected:
        cmap = class_map_for_task(name)
        assert cmap and all(isinstance(k, int) for k in cmap)
    # crop-model indirection for teeth
    assert TASKS["teeth"].crop_model == "craniofacial_structures"
    # BCA side unchanged
    assert set(BCA_TASKS) == {"body_parts", "body_regions"}
    assert get_task("total_mr", fast=True).task_ids == (852,)


def test_weights_manager_cli(tmp_path, monkeypatch):
    from boa_tpu.weights import manager

    monkeypatch.setenv("BOA_WEIGHTS_PATH", str(tmp_path))
    manager.main(["create-synthetic", "--task", "total_fastest",
                  "--root", str(tmp_path)])
    installed = manager.list_installed(tmp_path)
    assert any("298" in n for n in installed)
    # store can load it
    from boa_tpu.weights.store import ModelStore

    plans, params = ModelStore(tmp_path).load(
        298, trainer="nnUNetTrainer_4000epochs_NoMirroring")
    assert plans.num_segmentation_heads == 118
    assert len(params) == 1


def test_evans_index_inplane_alignment():
    """A rotated head yields the same Evans index as the aligned one: the
    moment-based in-plane normalization (atlas-free stand-in for the
    reference's ANTs registration) recovers the rotation."""
    from scipy import ndimage as ndi

    from boa_tpu.tools.evans_index import inplane_rotation_deg

    # head-like ellipse, AP (y) longer than LR (x); horns near the front
    yy, xx = np.mgrid[0:80, 0:80]
    ell = ((xx - 40) ** 2 / 24 ** 2 + (yy - 40) ** 2 / 34 ** 2) < 1.0
    brain0 = np.repeat(ell.T[:, :, None], 8, axis=2)
    vent0 = np.zeros((80, 80, 8), np.uint8)
    vent0[28:36, 52, 4] = 1
    vent0[44:52, 52, 4] = 2
    label_map = {1: "frontal_horn_left", 2: "frontal_horn_right"}

    ref = evans_index(vent0, label_map, brain0, (1.0, 1.0, 5.0))
    assert ref["success"] and abs(ref["inplane_rotation_deg"]) < 1.5

    deg = 14.0
    brain_r = ndi.rotate(brain0.astype(np.uint8), deg, axes=(1, 0),
                         reshape=False, order=0) > 0
    vent_r = ndi.rotate(vent0, deg, axes=(1, 0), reshape=False, order=0)
    est = inplane_rotation_deg(brain_r)
    assert est == pytest.approx(deg, abs=2.0)
    got = evans_index(vent_r, label_map, brain_r, (1.0, 1.0, 5.0))
    assert got["success"]
    assert got["evans_index"] == pytest.approx(ref["evans_index"], abs=0.03)


def test_rotate_masks_inplane_never_clips():
    """In-plane alignment rotation pads to the diagonal so an off-center
    head cannot lose voxels at the grid edge (plain reshape=False
    rotation of the same mask does)."""
    from scipy import ndimage as ndi

    from boa_tpu.tools.evans_index import _rotate_masks_inplane

    yy, xx = np.mgrid[0:80, 0:80]
    # blob in the corner: naive rotation about the center clips it
    blob = ((xx - 70) ** 2 + (yy - 70) ** 2) < 15 ** 2
    mask = np.repeat(blob.T[:, :, None], 4, axis=2)
    naive = ndi.rotate(mask.astype(np.uint8), 30.0, axes=(1, 0),
                       reshape=False, order=0) > 0
    assert naive.sum() < 0.9 * mask.sum()  # the failure mode being fixed
    (padded,) = _rotate_masks_inplane(30.0, mask)
    assert padded.sum() >= 0.97 * mask.sum()  # only aliasing jitter left


def test_evans_inner_skull_cavity():
    """With a skull mask the denominator measures the inner-skull cavity
    (brain dilated 2, skull removed, largest blob) — not the raw brain
    (totalseg_evans_index.py:246-270)."""
    from boa_tpu.tools.evans_index import evans_index, inner_skull_cavity

    shape = (64, 64, 12)
    brain = np.zeros(shape, bool)
    brain[16:48, 16:48, 2:10] = True          # raw brain: 32 wide
    skull = np.zeros(shape, bool)
    skull[12:52, 12:52, 1:11] = True           # skull shell outside a
    skull[13:51, 13:51, 1:11] = False          # 38-wide inner cavity
    skull[13:51, 13:51, :1] = False
    vent = np.zeros(shape, np.uint8)
    vent[28:36, 28:36, 4:8] = 1                # horns: 8 wide
    label_map = {1: "frontal_horn_left"}

    cav = inner_skull_cavity(brain, skull)
    assert cav.any() and not (cav & skull).any()
    # dilation grows the brain toward the skull: cavity wider than brain
    assert cav[:, 32, 5].sum() > brain[:, 32, 5].sum()

    res = evans_index(vent, label_map, brain, (1.0, 1.0, 1.0),
                      skull_mask=skull)
    assert res["success"]
    d_b = res["brain_diameter_mm"]
    res_raw = evans_index(vent, label_map, brain, (1.0, 1.0, 1.0))
    assert d_b > res_raw["brain_diameter_mm"]
    assert res["evans_index"] < res_raw["evans_index"]
