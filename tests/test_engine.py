"""Engine auxiliaries: fingerprint, planner, evaluation, ensembling,
postprocessing determination, benchmark harness."""

import json

import numpy as np
import pytest

from boa_tpu.engine.benchmark import benchmark_training
from boa_tpu.engine.ensembling import (
    apply_postprocessing, determine_postprocessing, ensemble_probabilities,
    ensemble_segmentations, remove_all_but_largest_component_from_segmentation)
from boa_tpu.engine.evaluation import evaluate_case, evaluate_folder_arrays
from boa_tpu.engine.fingerprint import extract_fingerprint
from boa_tpu.engine.planner import (determine_target_spacing,
                                    estimate_activation_elements,
                                    plan_experiment, pool_and_conv_props)
from boa_tpu.plans.plans import ModelPlans


@pytest.fixture()
def fingerprint(rng):
    cases = []
    for _ in range(6):
        shape = tuple(rng.integers(30, 60, 3))
        data = rng.normal(40, 200, shape).astype(np.float32)
        seg = (data > 100).astype(np.int8)
        cases.append((data, seg, (0.8, 0.8, 3.0)))
    return extract_fingerprint(cases)


def test_fingerprint_schema(fingerprint):
    assert len(fingerprint["spacings"]) == 6
    props = fingerprint["foreground_intensity_properties_per_channel"]["0"]
    assert props["percentile_00_5"] < props["median"] < props["percentile_99_5"]


def test_target_spacing_median_and_aniso():
    # isotropic-ish: median
    sp = np.tile([1.0, 1.0, 1.5], (10, 1))
    sz = np.tile([512, 512, 400], (10, 1))
    np.testing.assert_allclose(determine_target_spacing(sp, sz),
                               [1.0, 1.0, 1.5])
    # strongly anisotropic z with few slices -> 10th percentile override
    sp = np.vstack([np.tile([1.0, 1.0, 8.0], (9, 1)), [[1.0, 1.0, 4.0]]])
    sz = np.tile([512, 512, 40], (10, 1))
    target = determine_target_spacing(sp, sz)
    assert target[2] < 8.0  # pulled below the median by the aniso rule


def test_pool_and_conv_props():
    npool, strides, kernels, patch = pool_and_conv_props(
        (1.0, 1.0, 1.0), (128, 128, 128))
    assert strides[0] == [1, 1, 1]
    assert all(s == [2, 2, 2] for s in strides[1:])
    assert patch == [128, 128, 128]
    # anisotropic: z pools later
    npool2, strides2, _, _ = pool_and_conv_props((1.0, 1.0, 5.0),
                                                 (128, 128, 32))
    assert npool2[2] < npool2[0]
    assert strides2[1][2] == 1  # first pool skips the coarse axis


def test_plan_experiment(fingerprint, tmp_path):
    plans = plan_experiment(fingerprint, num_classes=5,
                            out_file=tmp_path / "plans.json")
    conf = plans["configurations"]["3d_fullres"]
    assert conf["batch_size"] >= 2
    arch = conf["architecture"]["arch_kwargs"]
    assert arch["n_stages"] == len(arch["strides"]) == len(arch["kernel_sizes"])
    # budget respected
    est = estimate_activation_elements(conf["patch_size"],
                                       arch["features_per_stage"],
                                       arch["strides"], 5)
    assert est / 2 * 2 <= 560e6 * 1.001
    # plans are loadable by our ModelPlans/ArchConfig machinery
    mp = ModelPlans(plans=plans, dataset={"labels": {
        "background": 0, "a": 1, "b": 2, "c": 3, "d": 4},
        "channel_names": {"0": "CT"}})
    cfg = mp.arch_config()
    assert cfg.num_classes == 5
    assert (tmp_path / "plans.json").exists()


def test_plan_scales_with_memory(fingerprint):
    small = plan_experiment(fingerprint, 5, hbm_target_gb=4)
    big = plan_experiment(fingerprint, 5, hbm_target_gb=16)
    assert np.prod(big["configurations"]["3d_fullres"]["patch_size"]) * \
        big["configurations"]["3d_fullres"]["batch_size"] >= \
        np.prod(small["configurations"]["3d_fullres"]["patch_size"]) * \
        small["configurations"]["3d_fullres"]["batch_size"]


def test_evaluate_case_and_folder(rng):
    ref = rng.integers(0, 3, (16, 16, 16))
    res = evaluate_case(ref, ref, [0, 1, 2])
    assert res["1"]["Dice"] == pytest.approx(1.0)
    pred = ref.copy()
    pred[ref == 2] = 0
    res2 = evaluate_folder_arrays({"c": ref}, {"c": pred}, [1, 2])
    assert res2["mean"]["2"]["Dice"] == pytest.approx(0.0)
    assert 0 < res2["foreground_mean"]["Dice"] < 1


def test_ensembling(rng):
    p1 = rng.random((3, 8, 8, 8)).astype(np.float32)
    p2 = rng.random((3, 8, 8, 8)).astype(np.float32)
    mean = ensemble_probabilities([p1, p2])
    np.testing.assert_allclose(mean, (p1 + p2) / 2, rtol=1e-6)
    seg = ensemble_segmentations([p1, p2])
    np.testing.assert_array_equal(seg, np.argmax((p1 + p2) / 2, 0))


def test_largest_component_removal():
    seg = np.zeros((20, 20, 20), np.uint8)
    seg[2:8, 2:8, 2:8] = 1          # big blob
    seg[15:17, 15:17, 15:17] = 1    # small blob
    out = remove_all_but_largest_component_from_segmentation(seg, 1)
    assert out[3, 3, 3] == 1 and out[16, 16, 16] == 0


def test_determine_postprocessing_helps():
    ref = np.zeros((20, 20, 20), np.uint8)
    ref[2:8, 2:8, 2:8] = 1
    pred = ref.copy()
    pred[15:17, 15:17, 15:17] = 1  # spurious island the filter removes
    pp = determine_postprocessing({"c": ref}, {"c": pred}, [0, 1])
    assert pp  # at least one filter chosen
    fixed = apply_postprocessing(pred, pp)
    assert (fixed == ref).all()


def test_determine_postprocessing_refuses_harm():
    # two genuine components: filter would delete one -> must NOT be chosen
    ref = np.zeros((20, 20, 20), np.uint8)
    ref[2:8, 2:8, 2:8] = 1
    ref[14:18, 14:18, 14:18] = 1
    pp = determine_postprocessing({"c": ref}, {"c": ref.copy()}, [0, 1])
    fixed = apply_postprocessing(ref.copy(), pp)
    assert (fixed == ref).all()


def test_benchmark_training(tmp_path):
    res = benchmark_training(tmp_path, patch=(16, 16, 16), batch_size=1,
                             num_classes=3, features=(4, 8), n_epochs=2,
                             iters_per_epoch=2)
    assert res["it_per_s"] > 0
    blob = json.loads((tmp_path / "benchmark_result.json").read_text())
    assert blob["backend"] in ("cpu", "tpu")
    assert len(blob["epoch_times_s"]) == 2


def test_find_best_configuration():
    from boa_tpu.engine.ensembling import find_best_configuration

    ref = np.zeros((12, 12, 12), np.uint8)
    ref[3:8, 3:8, 3:8] = 1
    good = {"c": ref.copy()}
    bad = {"c": np.roll(ref, 4, axis=0)}
    res = find_best_configuration(
        {"c": ref}, {"3d_fullres": good, "3d_lowres": bad}, [0, 1])
    assert res["best_configuration"] == "3d_fullres"
    assert res["scores"]["3d_fullres"] > res["scores"]["3d_lowres"]


def test_plan_and_preprocess_end_to_end(tmp_path, rng):
    """Raw dataset dir → fingerprint → plans → trainable case store."""
    from boa_tpu.engine.plan_and_preprocess import plan_and_preprocess
    from boa_tpu.io import nifti
    from boa_tpu.train.dataset import CaseStore

    ds = tmp_path / "Dataset001_Toy"
    (ds / "imagesTr").mkdir(parents=True)
    (ds / "labelsTr").mkdir()
    (ds / "dataset.json").write_text(json.dumps({
        "channel_names": {"0": "CT"},
        "labels": {"background": 0, "organ": 1},
        "numTraining": 3, "file_ending": ".nii.gz"}))
    for k in range(3):
        shape = (24 + k, 22, 20)
        data = np.zeros(shape, np.int16)
        data[3:-3, 3:-3, 3:-3] = rng.integers(-100, 300, 
                                              tuple(s - 6 for s in shape))
        seg = np.zeros(shape, np.uint8)
        seg[8:14, 8:14, 8:14] = 1
        aff = np.diag([0.8, 0.8, 2.4, 1.0])
        nifti.save(nifti.NiftiImage(data=data, affine=aff),
                   ds / "imagesTr" / f"case{k}_0000.nii.gz")
        nifti.save(nifti.NiftiImage(data=seg, affine=aff),
                   ds / "labelsTr" / f"case{k}.nii.gz")

    out = tmp_path / "prep"
    plans = plan_and_preprocess(ds, out)
    assert (out / "plans.json").exists()
    assert (out / "fingerprint.json").exists()
    store = CaseStore(out / "cases")
    assert store.case_ids() == ["case0", "case1", "case2"]
    c = store.load_case("case0")
    assert 1 in c.class_locations  # foreground locations for oversampling
    # the preprocessed data is normalized (roughly zero-centered)
    assert abs(float(np.asarray(c.data).mean())) < 2.0
    # trainable: one tiny epoch
    from boa_tpu.train.run_training import run_training

    last = run_training(out / "cases", tmp_path / "tr", patch=(8, 8, 8),
                        batch_size=1, epochs=1, iters=2, augment=False,
                        num_classes=2, seed=0)
    assert np.isfinite(last["loss"])

    # train -> serve loop: export the trained checkpoint into the store
    # layout and run the REAL predictor on a raw case
    # (nnU-Net serves straight from its results folder,
    # predict_from_raw_data.py:83-120 — this is our equivalent)
    from boa_tpu.inference.predictor import Predictor
    from boa_tpu.weights.store import ModelStore, export_trained_model

    mdir = export_trained_model(tmp_path / "tr", task_id=901, name="Toy",
                                root=tmp_path / "store")
    assert (mdir / "plans.json").exists()
    assert (mdir / "fold_0" / "checkpoint_final.npz").exists()
    plans, params = ModelStore(tmp_path / "store").load(901)
    cfg = plans.arch_config()
    assert cfg.num_classes == 2
    assert cfg.features_per_stage[0] == 32  # run_training default arch
    # plans carry the prep spacing + real intensity stats
    conf = plans.plans["configurations"]["3d_fullres"]
    assert tuple(conf["spacing"]) != (1.0, 1.0, 1.0)
    img = nifti.load(ds / "imagesTr" / "case0_0000.nii.gz")
    pred = Predictor(plans=plans, fold_params=params,
                     compute_dtype="float32")
    seg = pred.predict(np.asarray(img.data, np.float32), img.zooms)
    assert seg.shape == img.shape
    assert set(np.unique(seg)) <= {0, 1}


def _big_body_fingerprint():
    """Whole-body-CT-like fingerprint (no actual volumes needed)."""
    return {
        "spacings": [[0.8, 0.8, 1.0]] * 10,
        "shapes_after_crop": [[512, 512, 900]] * 10,
        "foreground_intensity_properties_per_channel": {
            "0": {"max": 1500.0, "mean": 100.0, "median": 80.0,
                  "min": -1000.0, "percentile_00_5": -900.0,
                  "percentile_99_5": 1200.0, "std": 300.0}},
    }


def test_plan_2d_configuration(fingerprint):
    plans = plan_experiment(fingerprint, num_classes=5)
    conf = plans["configurations"]["2d"]
    assert len(conf["patch_size"]) == 2
    assert len(conf["spacing"]) == 2
    arch = conf["architecture"]["arch_kwargs"]
    assert all(len(k) == 2 for k in arch["kernel_sizes"])
    assert max(arch["features_per_stage"]) <= 512
    assert conf["batch_size"] >= 2


def test_plan_lowres_and_cascade_for_big_volumes():
    """A whole-body fingerprint whose median volume dwarfs the fullres
    patch gets 3d_lowres + 3d_cascade_fullres (planner lowres-creation
    rule, default_experiment_planner.py)."""
    plans = plan_experiment(_big_body_fingerprint(), num_classes=10)
    confs = plans["configurations"]
    assert "3d_lowres" in confs and "3d_cascade_fullres" in confs
    low = confs["3d_lowres"]
    full = confs["3d_fullres"]
    assert all(ls >= fs for ls, fs in zip(low["spacing"], full["spacing"]))
    # patch covers enough of the median lowres volume
    import numpy as _np

    from boa_tpu.engine.planner import _median_resampled_shape
    ratio = float(_np.prod(_median_resampled_shape(
        _big_body_fingerprint(), low["spacing"]))) / \
        float(_np.prod(low["patch_size"]))
    assert ratio <= 8.5
    # cascade inherits fullres via the plans machinery
    cascade = confs["3d_cascade_fullres"]
    assert cascade["previous_stage"] == "3d_lowres"
    # the cascade configuration resolves to the fullres architecture
    mp2 = ModelPlans(plans=plans, dataset={"labels": {
        "background": 0, **{f"c{i}": i for i in range(1, 10)}},
        "channel_names": {"0": "CT"}},
        configuration_name="3d_cascade_fullres")
    assert mp2.patch_size == full["patch_size"]


def test_plan_small_dataset_has_no_lowres(fingerprint):
    plans = plan_experiment(fingerprint, num_classes=5)
    assert "3d_lowres" not in plans["configurations"]


def test_resenc_presets():
    plans_m = plan_experiment(_big_body_fingerprint(), 10, preset="resenc_m")
    conf = plans_m["configurations"]["3d_fullres"]
    arch = conf["architecture"]
    assert arch["network_class_name"].endswith("ResidualEncoderUNet")
    kw = arch["arch_kwargs"]
    assert kw["n_blocks_per_stage"][:4] == [1, 3, 4, 6][:len(
        kw["n_blocks_per_stage"])][:4]
    assert all(c == 1 for c in kw["n_conv_per_stage_decoder"])
    # larger preset => at least as much patch*batch budget
    plans_l = plan_experiment(_big_body_fingerprint(), 10, preset="resenc_l")
    m_conf = plans_m["configurations"]["3d_fullres"]
    l_conf = plans_l["configurations"]["3d_fullres"]
    assert np.prod(l_conf["patch_size"]) * l_conf["batch_size"] >= \
        np.prod(m_conf["patch_size"]) * m_conf["batch_size"]


def test_predict_folder_cli(tmp_path):
    """nnUNetv2_predict-equivalent CLI: folder in -> predictions out, with
    part sharding, resume, and probability export."""
    import numpy as np

    from boa_tpu.engine import predict as ep
    from boa_tpu.io import nifti
    from boa_tpu.weights.store import ModelStore, create_synthetic_model

    store_dir = tmp_path / "w"
    create_synthetic_model(store_dir, 901, "Toy", num_classes=3,
                           patch_size=(16, 16, 16), spacing=(3.0, 3.0, 3.0),
                           features=(4, 8))
    in_dir = tmp_path / "cases"
    in_dir.mkdir()
    rng = np.random.default_rng(0)
    for i, name in enumerate(["caseA_0000.nii.gz", "caseB.nii.gz",
                              "caseC_0000.nii.gz"]):
        data = rng.normal(0, 200, size=(20, 18, 16)).astype(np.int16)
        nifti.save(nifti.NiftiImage(data=data,
                                    affine=np.diag([3.0, 3.0, 3.0, 1.0])),
                   in_dir / name)

    out_dir = tmp_path / "preds"
    store = ModelStore(store_dir)
    # part 0 of 2 takes cases [caseA, caseC]; part 1 takes [caseB]
    w0 = ep.predict_folder(in_dir, out_dir, task_id=901, folds=[0],
                           num_parts=2, part_id=0, store=store,
                           disable_tta=True)
    assert [p.name for p in w0] == ["caseA.nii.gz", "caseC.nii.gz"]
    w1 = ep.predict_folder(in_dir, out_dir, task_id=901, folds=[0],
                           num_parts=2, part_id=1, store=store,
                           disable_tta=True, save_probabilities=True)
    assert [p.name for p in w1] == ["caseB.nii.gz"]
    assert (out_dir / "caseB.npz").exists()
    assert (out_dir / "caseB.pkl").exists()
    probs = np.load(out_dir / "caseB.npz")["probabilities"]
    seg = np.asarray(nifti.load(out_dir / "caseB.nii.gz").data)
    assert probs.shape == (3, 20, 18, 16)
    np.testing.assert_array_equal(np.argmax(probs, 0), seg)

    # resume skips everything already written
    again = ep.predict_folder(in_dir, out_dir, task_id=901, folds=[0],
                              store=store, continue_prediction=True,
                              disable_tta=True)
    assert again == []

    # explicit model-folder form (-m) matches the store form
    mdir = store.model_dir(901)
    w_m = ep.predict_folder(in_dir, tmp_path / "preds_m", model_dir=mdir,
                            folds=[0], disable_tta=True)
    segA = np.asarray(nifti.load(out_dir / "caseA.nii.gz").data)
    segA_m = np.asarray(nifti.load(tmp_path / "preds_m/caseA.nii.gz").data)
    np.testing.assert_array_equal(segA, segA_m)


def test_ensemble_and_evaluate_cli(tmp_path):
    """Predict with probabilities from two 'configurations', ensemble the
    folders, apply a postprocessing plan, and evaluate against references
    (nnUNetv2_ensemble / _apply_postprocessing / _evaluate_folder)."""
    import json

    import numpy as np

    from boa_tpu.engine import ensembling, evaluation
    from boa_tpu.io import nifti

    rng = np.random.default_rng(1)
    ref_dir = tmp_path / "refs"
    cfg_a = tmp_path / "cfgA"
    cfg_b = tmp_path / "cfgB"
    for d in (ref_dir, cfg_a, cfg_b):
        d.mkdir()
    affine = np.diag([1.5, 1.5, 3.0, 1.0])
    for cid in ("c1", "c2"):
        ref = np.zeros((16, 14, 10), np.uint8)
        ref[4:10, 4:10, 2:8] = 1
        nifti.save(nifti.NiftiImage(data=ref, affine=affine),
                   ref_dir / f"{cid}.nii.gz")
        for d, flip in ((cfg_a, 0.9), (cfg_b, 0.8)):
            probs = np.zeros((2, 16, 14, 10), np.float16)
            probs[0] = 1.0
            probs[1, 4:10, 4:10, 2:8] = flip
            probs[0, 4:10, 4:10, 2:8] = 1.0 - flip
            # a stray speckle only in config A: the ensemble keeps it
            # (mean prob 0.45 < 0.5 -> actually dropped), so add to both
            probs[1, 0, 0, 0] = 0.95
            probs[0, 0, 0, 0] = 0.05
            np.savez_compressed(d / f"{cid}.npz", probabilities=probs)
            import pickle

            with open(d / f"{cid}.pkl", "wb") as fh:
                pickle.dump({"spacing": (3.0, 1.5, 1.5)}, fh)

    pp_plan = tmp_path / "pp.json"
    pp_plan.write_text(json.dumps(
        [{"fn": "remove_all_but_largest_component",
          "kwargs": {"labels_or_regions": [1]}}]))

    out = tmp_path / "ens"
    ensembling.main(["-i", str(cfg_a), str(cfg_b), "-o", str(out),
                     "--save_npz", "-pp", str(pp_plan)])
    seg = np.asarray(nifti.load(out / "c1.nii.gz").data)
    assert seg[6, 6, 4] == 1
    assert seg[0, 0, 0] == 0          # speckle removed by postprocessing
    assert (out / "c1.npz").exists()  # ensembled probabilities saved

    summary = tmp_path / "summary.json"
    evaluation.main([str(ref_dir), str(out), "-o", str(summary)])
    res = json.loads(summary.read_text())
    assert res["foreground_mean"]["Dice"] > 0.99


def test_find_best_configuration_folders(tmp_path):
    """Folder-level nnUNetv2_find_best_configuration: pick the better
    config by CV Dice and attach the postprocessing decision."""
    import numpy as np

    from boa_tpu.engine.ensembling import find_best_configuration_folders
    from boa_tpu.io import nifti

    affine = np.eye(4)
    ref_dir, good, bad = (tmp_path / d for d in ("refs", "good", "bad"))
    for d in (ref_dir, good, bad):
        d.mkdir()
    for cid in ("c1", "c2"):
        ref = np.zeros((12, 12, 8), np.uint8)
        ref[3:9, 3:9, 2:6] = 1
        nifti.save(nifti.NiftiImage(data=ref, affine=affine),
                   ref_dir / f"{cid}.nii.gz")
        g = ref.copy()
        g[0, 0, 0] = 1  # stray speckle the postprocessing should remove
        nifti.save(nifti.NiftiImage(data=g, affine=affine),
                   good / f"{cid}.nii.gz")
        b = np.zeros_like(ref)
        b[3:6, 3:6, 2:4] = 1  # undersegmented
        nifti.save(nifti.NiftiImage(data=b, affine=affine),
                   bad / f"{cid}.nii.gz")

    out = tmp_path / "best.json"
    res = find_best_configuration_folders(
        ref_dir, {"good": good, "bad": bad}, out_file=out)
    assert res["best_configuration"] == "good"
    assert res["scores"]["good"] > res["scores"]["bad"]
    assert any(p["fn"] == "remove_all_but_largest_component"
               for p in res["postprocessing"])
    assert out.exists()
