"""serve/warmup bake-step behavior (deploy-time precompile, VERDICT r3 #9)."""

import numpy as np

from boa_tpu.serve import warmup
from boa_tpu.tasks.registry import resolve_task
from boa_tpu.weights.store import ModelStore


def test_raw_z_bucket_enumeration():
    task = resolve_task("total", fast=True)  # 3 mm resample
    zs = warmup._raw_z_for_buckets(task, (1.5, 1.5, 3.0), (200, 600), 64)
    # model z = raw z (3mm->3mm); buckets of 64 between 200..600 => 7
    models = sorted({-(-z // 64) * 64 for z in zs})
    assert len(zs) == len(models) == 7
    assert models[0] == 256 and models[-1] == 640


def test_full_bake_covers_nonfast_and_cropped_shapes(tmp_path, monkeypatch):
    """--full extends the bake to the 5-sub-model total ensemble + 5-fold
    BCA programs, at both the uncropped FOV and the common body-crop
    bucket (VERDICT r4 #6)."""
    calls = []

    def record(store, name, *, fast, xy, **kw):
        calls.append((name, fast, xy))
        return [0.0]

    monkeypatch.setattr(warmup, "warmup_task", record)
    warmup.bake(ModelStore(tmp_path / "w"), full=True)
    assert ("total", False, 512) in calls
    assert ("total", False, (384, 320)) in calls
    assert ("body_regions", False, (384, 320)) in calls
    assert ("body_parts", False, 512) in calls
    # the fast set still warms, uncropped-only
    assert ("total", True, 512) in calls
    assert ("total", True, (384, 320)) not in calls


def test_bake_stamp_skips_and_tolerates_missing_weights(tmp_path, caplog):
    store = ModelStore(tmp_path / "empty")
    stamp = tmp_path / "warm.stamp"
    import logging

    with caplog.at_level(logging.WARNING, logger="boa_tpu.serve.warmup"):
        warmup.bake(store, tasks=[("total", True)], stamp=str(stamp))
    # missing weights are a warning, not a crash; the stamp still lands
    assert stamp.exists()
    assert any("skipping bake" in r.message for r in caplog.records)

    # second boot: stamped, no work attempted (no new warnings)
    caplog.clear()
    with caplog.at_level(logging.INFO, logger="boa_tpu.serve.warmup"):
        warmup.bake(store, tasks=[("total", True)], stamp=str(stamp))
    assert any("skipping bake" in r.message for r in caplog.records)
    assert not any("skipping bake of" in r.message for r in caplog.records)
