"""Environment/flag parsing and model-spec resolution.

Behavior parity with `body_organ_analysis/compute/config.py`: boolean and
string env vars where ``TODO``/empty mean "unset", ``+``-separated model
specs with an ``all`` shortcut and license gating, and device-string
normalization (adapted: this build targets the TPU backend, so the
reference's ``gpu``/``cuda`` spellings are treated as accelerator aliases).
"""

from __future__ import annotations

import logging
import os

from boa_tpu.utils.constants import ALL_MODELS, AVAILABLE_MODELS, LICENSE_MODELS

logger = logging.getLogger(__name__)

#: values (lowercased) that make a boolean env var True
_TRUE_WORDS = frozenset({"1", "true"})
#: values (lowercased) that leave a string env var unset
_PLACEHOLDER_WORDS = frozenset({"", "todo"})


def env_bool(name: str, default: bool = False) -> bool:
    value = os.environ.get(name)
    if value is None:
        return default
    return value.strip().lower() in _TRUE_WORDS


def env_str(name: str, default: str | None = None) -> str | None:
    value = os.environ.get(name)
    if value is None:
        return default
    value = value.strip()
    if value.lower() in _PLACEHOLDER_WORDS:
        return default
    return value


def _validate_license_online(license_number: str, backend: str) -> bool:
    """Remote license validation, reference protocol
    (`totalsegmentator/config.py:107-120`): POST ``{"license_number": ..}``
    as JSON to ``<backend>/is_valid_license_number`` with a 5 s timeout;
    accept only an HTTP-ok response whose JSON carries
    ``status == "valid_license"``. Server errors, timeouts, unreachable
    hosts, and malformed bodies all reject."""
    import json
    import urllib.request

    url = backend.rstrip("/") + "/is_valid_license_number"
    req = urllib.request.Request(
        url, data=json.dumps({"license_number": license_number}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=5) as resp:
            return json.loads(resp.read().decode())["status"] == "valid_license"
    except Exception as e:  # non-2xx raises HTTPError; plus URLError/JSON
        logger.error("License backend validation failed: %s", e)
        return False


def is_valid_license(license_number: str | None) -> bool:
    """License check gating the commercial model set.

    With ``BOA_LICENSE_BACKEND`` set (e.g. the reference's
    ``https://backend.totalsegmentator.com:443``) the key is validated
    against the remote backend exactly like the reference
    (`totalsegmentator/config.py:107-120`). Without a configured backend
    — the default, and the only option in an egress-blocked deployment —
    only the documented key shape is checked (``aca_`` prefix, 18
    characters total — `bin/totalseg_set_license.py:31-34`); an
    invalid-but-well-formed key will surface later as a failed weight
    download rather than here.
    """
    if not license_number:
        return False
    backend = env_str("BOA_LICENSE_BACKEND")
    if backend:
        return _validate_license_online(license_number, backend)
    return license_number.startswith("aca_") and len(license_number) == 18


def _expand_bca(models: set[str]) -> set[str]:
    # the bca pipeline runs body_parts/body_regions itself and needs the
    # total segmentation for vertebra windows
    if "bca" in models:
        models = models | {"total"}
        models.discard("body_parts")
        models.discard("body_regions")
    return models


def resolve_models(
    spec: str | None, strict: bool = False,
    license_number: str | None = None,
    license_valid: bool | None = None,
) -> set[str]:
    """Turn a ``+``-separated model spec into the set of models to run.

    ``license_valid`` lets a caller that already validated the key (the
    CLI does, with a potentially remote check) pass the verdict through
    instead of paying/racing a second backend round trip."""
    # falsy spec (None OR empty string, e.g. a docker-compose pass-through
    # of an unset host var) means "all", like the reference's `if not spec`
    if not spec or spec.lower() == "all":
        selected = set(ALL_MODELS)
        if (is_valid_license(license_number) if license_valid is None
                else license_valid):
            selected |= LICENSE_MODELS
        return _expand_bca(selected)

    selected = set()
    unknown = []
    for token in spec.split("+"):
        name = token.replace("-", "_")
        if name in AVAILABLE_MODELS:
            selected.add(name)
        else:
            unknown.append(name)
    if unknown:
        choices = ", ".join(sorted(AVAILABLE_MODELS))
        if strict:
            raise ValueError(
                f"unrecognized model name(s) {sorted(unknown)}; "
                f"choose from: {choices}")
        logger.error("Skipping unrecognized model name(s) %s (choose from: %s)",
                     sorted(unknown), choices)
    return _expand_bca(selected)


#: accepted accelerator spellings; reference-era configs say gpu/cuda
_ACCELERATOR_ALIASES = frozenset({"gpu", "cuda", "tpu"})


def resolve_device(device: str | None = None) -> str:
    """Normalize a device spec to ``tpu[:idx]`` or ``cpu``.

    ``gpu``/``cuda`` (the reference's spellings) map to the TPU backend;
    this rewrite is logged so reference-era configs are not silently
    reinterpreted.
    """
    requested = device or os.environ.get("DEVICE", "tpu")
    kind, _, index = requested.partition(":")
    kind = kind.lower()
    if kind in _ACCELERATOR_ALIASES:
        if kind != "tpu":
            logger.info("Device %r requested; using the TPU backend "
                        "(this build is TPU-native).", requested)
        kind = "tpu"
    elif kind != "cpu":
        raise ValueError(f"unknown device {kind!r}")
    index = index or os.environ.get("NVIDIA_ID", "")
    return f"{kind}:{index}" if index else kind
