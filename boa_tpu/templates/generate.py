"""Generate dcmqi-style DICOM-SEG metainfo templates.

Parity: `body_organ_analysis/templates/*-meta.json` — 12 JSON templates
(one per output kind) enumerated at `compute/io.py:134-137`. The reference
commits them by hand; here they are generated from the class-map registry
so labels can never drift from the models. Run
`python -m boa_tpu.templates.generate` to (re)write them next to this file.
"""

from __future__ import annotations

import colorsys
import json
from pathlib import Path

from boa_tpu.io.storage import SEG_OUTPUT_KINDS, _label_map_for_kind
from boa_tpu.utils.constants import SERIES_DESCRIPTIONS


def _color(i: int, n: int) -> list[int]:
    r, g, b = colorsys.hsv_to_rgb((i / max(n, 1)) % 1.0, 0.65, 0.9)
    return [int(r * 255), int(g * 255), int(b * 255)]


def template_for_kind(kind: str) -> dict | None:
    label_map = _label_map_for_kind(kind)
    if not label_map:
        return None
    labels = sorted(label_map)
    segments = []
    for i, lb in enumerate(labels):
        if lb == 0:
            continue
        segments.append({
            "labelID": int(lb),
            "SegmentLabel": label_map[lb],
            "SegmentDescription": label_map[lb],
            "SegmentAlgorithmType": "AUTOMATIC",
            "SegmentAlgorithmName": "BOA-TPU",
            "recommendedDisplayRGBValue": _color(i, len(labels)),
            "SegmentedPropertyCategoryCodeSequence": {
                "CodeValue": "123037004",
                "CodingSchemeDesignator": "SCT",
                "CodeMeaning": "Anatomical Structure",
            },
            "SegmentedPropertyTypeCodeSequence": {
                "CodeValue": "78961009",
                "CodingSchemeDesignator": "SCT",
                "CodeMeaning": "Anatomical structure",
            },
        })
    return {
        "ContentCreatorName": "BOA-TPU",
        "ClinicalTrialSeriesID": "Session1",
        "ClinicalTrialTimePointID": "1",
        "SeriesDescription": SERIES_DESCRIPTIONS.get(kind, kind),
        "SeriesNumber": "300",
        "InstanceNumber": "1",
        "BodyPartExamined": "",
        "segmentAttributes": [segments],
        "ContentLabel": "SEGMENTATION",
        "ContentDescription": "Image segmentation",
        "ClinicalTrialCoordinatingCenterName": "",
    }


def write_all(out_dir: str | Path | None = None) -> list[Path]:
    out_dir = Path(out_dir) if out_dir else Path(__file__).parent
    written = []
    for kind in SEG_OUTPUT_KINDS:
        tpl = template_for_kind(kind)
        if tpl is None:
            continue
        p = out_dir / f"{kind}-meta.json"
        p.write_text(json.dumps(tpl, indent=2))
        written.append(p)
    return written


if __name__ == "__main__":
    for p in write_all():
        print(p)
