"""Segmentation label tables (model metadata, loaded from JSON data files).

Parity: `totalsegmentator/map_to_binary.py:5` (`class_map`, 50 task label
dictionaries; `total` = 117 classes), `:808` (`class_map_5_parts`, the split
of `total` into the 5 sub-model outputs), `:1054`
(`map_taskid_to_partname_ct`). These tables define what each integer in a
checkpoint's output head means and must match the published weights exactly;
they were serialized from the reference as data (see
tools/extract_reference_data.py).
"""

from __future__ import annotations

import json
from functools import lru_cache
from pathlib import Path

_DATA = Path(__file__).parent / "data"


@lru_cache(maxsize=1)
def _load() -> dict:
    with open(_DATA / "class_maps.json") as f:
        raw = json.load(f)
    return {
        "class_map": {
            task: {int(i): name for i, name in labels.items()}
            for task, labels in raw["class_map"].items()
        },
        "class_map_5_parts": {
            part: {int(i): name for i, name in labels.items()}
            for part, labels in raw["class_map_5_parts"].items()
        },
        "map_taskid_to_partname_ct": {
            int(tid): part for tid, part in raw["map_taskid_to_partname_ct"].items()
        },
        "commercial_models": raw["commercial_models"],
    }


@lru_cache(maxsize=1)
def _load_bca() -> dict:
    with open(_DATA / "bca_definitions.json") as f:
        return json.load(f)


def __getattr__(name: str):
    data = _load()
    if name in data:
        return data[name]
    raise AttributeError(name)


# Explicit accessors (friendlier than module __getattr__ for tooling)
def get_class_map(task_name: str) -> dict[int, str]:
    return _load()["class_map"][task_name]


class _Lazy:
    def __init__(self, key: str):
        self._key = key

    def __getitem__(self, item):
        return _load()[self._key][item]

    def __contains__(self, item):
        return item in _load()[self._key]

    def items(self):
        return _load()[self._key].items()

    def keys(self):
        return _load()[self._key].keys()

    def values(self):
        return _load()[self._key].values()

    def __iter__(self):
        return iter(_load()[self._key])

    def __len__(self):
        return len(_load()[self._key])


class_map = _Lazy("class_map")
class_map_5_parts = _Lazy("class_map_5_parts")
map_taskid_to_partname = _Lazy("map_taskid_to_partname_ct")


# ---- BCA label semantics (parity: body_composition_analysis definitions) ----


def bca_body_regions() -> dict[str, int]:
    """11 body-region labels (`body_regions/definition.py:4-15`)."""
    return dict(_load_bca()["body_regions"])


def bca_body_parts() -> dict[str, int]:
    """7 body-part labels incl. background (`body_parts/definition.py:4-11`)."""
    return dict(_load_bca()["body_parts"])


def bca_tissues() -> dict[str, int]:
    """7 tissue classes (`tissue/definition.py:12-19`)."""
    return dict(_load_bca()["tissues"])


def bca_hu_ranges() -> dict[str, tuple[float, float]]:
    return {k: tuple(v) for k, v in _load_bca()["hu_ranges"].items()}


def bca_tissue_rules() -> list[dict[str, str]]:
    """tissue = HU-range ∩ body-region table (`tissue/definition.py:22-30`)."""
    return list(_load_bca()["tissue_derivation_rules"])
