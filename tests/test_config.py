"""Model-spec / device / env resolution tests.

Mirrors the reference's pure-logic unit tests (`tests/test_config.py:16-148`).
"""

import pytest

from boa_tpu.utils.config import env_bool, env_str, resolve_device, resolve_models
from boa_tpu.utils.constants import ALL_MODELS


def test_all_models_default():
    # 'all' includes bca, which implies total and drops the standalone
    # body_parts/body_regions entries (they run inside the bca pipeline)
    expected = (set(ALL_MODELS) | {"total"}) - {"body_parts", "body_regions"}
    assert resolve_models(None) == resolve_models("all") == expected


def test_plus_split_and_dash_alias():
    assert resolve_models("total+lung-vessels") == {"total", "lung_vessels"}


def test_bca_implies_total_and_drops_parts():
    models = resolve_models("bca+body_parts")
    assert "total" in models
    assert "body_parts" not in models and "body_regions" not in models
    assert "bca" in models


def test_invalid_strict_raises():
    with pytest.raises(ValueError):
        resolve_models("nonsense", strict=True)


def test_invalid_lenient_dropped():
    assert resolve_models("total+nonsense") == {"total"}


def test_license_gating():
    assert "heartchambers_highres" not in resolve_models("all")
    # aca_ prefix, 18 chars total (bin/totalseg_set_license.py:31-34)
    ok = resolve_models("all", license_number="aca_" + "x" * 14)
    assert "heartchambers_highres" in ok


def test_resolve_device_aliases(monkeypatch):
    monkeypatch.delenv("DEVICE", raising=False)
    monkeypatch.delenv("NVIDIA_ID", raising=False)
    assert resolve_device("cuda") == "tpu"
    assert resolve_device("gpu:1") == "tpu:1"
    assert resolve_device("cpu") == "cpu"
    with pytest.raises(ValueError):
        resolve_device("quantum")


def test_env_parsing(monkeypatch):
    monkeypatch.setenv("X_BOOL", "TRUE")
    monkeypatch.setenv("X_TODO", "TODO")
    monkeypatch.setenv("X_EMPTY", "")
    assert env_bool("X_BOOL") is True
    assert env_bool("X_MISSING", default=True) is True
    assert env_str("X_TODO") is None
    assert env_str("X_EMPTY", "fallback") == "fallback"


def test_resolve_models_empty_string_means_all():
    """Docker-compose pass-through of an unset host var yields '' — the
    reference's `if not spec` treats it as 'all'."""
    from boa_tpu.utils.config import resolve_models

    assert resolve_models("") == resolve_models(None)
    assert len(resolve_models("")) > 3
