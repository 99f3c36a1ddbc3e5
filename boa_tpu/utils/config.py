"""Env/flag parsing and model-spec resolution.

Parity: `body_organ_analysis/compute/config.py` — env_bool/env_str with the
``TODO``/empty = unset convention (`:13-26`), `resolve_models` (`:29-56`:
``+``-split, ``all`` shortcut, bca => +total -body_parts/-body_regions,
license gating), `resolve_device` (`:59-69`, adapted: ``gpu``/``cuda``
aliases map to the TPU backend here).
"""

from __future__ import annotations

import logging
import os

from boa_tpu.utils.constants import ALL_MODELS, AVAILABLE_MODELS, LICENSE_MODELS

logger = logging.getLogger(__name__)


def env_bool(name: str, default: bool = False) -> bool:
    raw = os.getenv(name)
    if raw is None:
        return default
    return raw.strip().lower() in {"1", "true"}


def env_str(name: str, default: str | None = None) -> str | None:
    raw = os.getenv(name)
    if raw is None or raw.strip().lower() in {"", "todo"}:
        return default
    return raw.strip()


def is_valid_license(license_number: str | None) -> bool:
    """License check stub.

    The reference validates against a remote backend
    (`totalsegmentator/config.py:107-120`); with no egress we accept the
    documented format (``aca_`` prefix + 18 chars) and let weight download
    fail later if invalid.
    """
    return bool(license_number) and license_number.startswith("aca_") and len(license_number) == 22


def resolve_models(
    spec: str | None, strict: bool = False, license_number: str | None = None
) -> set[str]:
    if not spec or spec.lower() == "all":
        models = set(ALL_MODELS)
        if license_number and is_valid_license(license_number):
            models |= LICENSE_MODELS
    else:
        models = {s.replace("-", "_") for s in spec.split("+")}
        invalid = models - AVAILABLE_MODELS
        if invalid:
            if strict:
                raise ValueError(
                    f"Unknown model(s): {', '.join(sorted(invalid))}. "
                    f"Available: {', '.join(sorted(AVAILABLE_MODELS))}"
                )
            logger.error(
                "Ignoring invalid model entries: %s. Available models are: %s.",
                invalid,
                sorted(AVAILABLE_MODELS),
            )
            models -= invalid
    if "bca" in models:
        models = (models | {"total"}) - {"body_regions", "body_parts"}
    return models


def resolve_device(device: str | None = None) -> str:
    """Normalize a device spec. TPU is the native target; 'gpu'/'cuda' are
    accepted aliases from reference-era configs and map to the accelerator
    backend; 'cpu' forces the CPU backend (useful for tests)."""
    device_str = device or os.environ.get("DEVICE", "tpu")
    device_str, _, idx = device_str.partition(":")
    device_str = device_str.lower()
    if device_str in {"gpu", "cuda", "tpu"}:
        device_str = "tpu"
    elif device_str != "cpu":
        raise ValueError(f"unknown device {device_str!r}")
    idx = idx or os.environ.get("NVIDIA_ID", "")
    return f"{device_str}:{idx}" if idx else device_str
