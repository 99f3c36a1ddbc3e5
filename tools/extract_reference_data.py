"""One-off extractor: reference label dictionaries -> JSON data files.

The class-name<->index tables (117-class `total` map, 5-part split maps, BCA
region/part/tissue semantics) are *factual model metadata* that any
interoperable implementation must agree on (they define what label 7 means in
a checkpoint's output head). We import them from the read-only reference and
serialize to JSON data files; no reference *code* is copied.

Run: python tools/extract_reference_data.py
"""

import json
import sys
from pathlib import Path

REF = Path("/root/reference/body_organ_analysis/_external")
OUT = Path(__file__).resolve().parent.parent / "boa_tpu" / "tasks" / "data"


def main() -> None:
    sys.path.insert(0, str(REF))
    from totalsegmentator import map_to_binary as m2b  # noqa: PLC0415

    OUT.mkdir(parents=True, exist_ok=True)

    payload = {
        "class_map": {k: {str(i): n for i, n in v.items()} for k, v in m2b.class_map.items()},
        "class_map_5_parts": {
            k: {str(i): n for i, n in v.items()} for k, v in m2b.class_map_5_parts.items()
        },
        "map_taskid_to_partname_ct": {
            str(k): v for k, v in m2b.map_taskid_to_partname_ct.items()
        },
        "commercial_models": m2b.commercial_models,
    }
    (OUT / "class_maps.json").write_text(json.dumps(payload))
    print(f"class_maps.json: {len(payload['class_map'])} tasks, "
          f"total has {len(payload['class_map']['total'])} classes")

    from body_composition_analysis.body_parts.definition import BodyParts  # noqa: PLC0415
    from body_composition_analysis.body_regions.definition import BodyRegion  # noqa: PLC0415
    from body_composition_analysis.tissue import definition as tissue_def  # noqa: PLC0415

    bca = {
        "body_regions": {e.name: int(e.value) for e in BodyRegion},
        "body_parts": {e.name: int(e.value) for e in BodyParts},
        "tissues": {e.name: int(e.value) for e in tissue_def.Tissue},
        "hu_ranges": {e.name: list(e.value) for e in tissue_def.HURange},
        "tissue_derivation_rules": [
            {"tissue": t.name, "hu_range": hu.name, "region": r.name}
            for t, (hu, r) in tissue_def.TISSUE_DERIVATION_RULES.items()
        ],
    }
    (OUT / "bca_definitions.json").write_text(json.dumps(bca, indent=1))
    print(f"bca_definitions.json: {bca['body_regions']}")


if __name__ == "__main__":
    main()
