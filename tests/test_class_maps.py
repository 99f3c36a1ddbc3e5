from boa_tpu.tasks import class_maps
from boa_tpu.tasks.registry import BCA_TASKS, TASKS, get_task


def test_total_has_117_classes():
    cm = class_maps.get_class_map("total")
    assert len(cm) == 117
    assert cm[1] == "spleen"


def test_5_parts_cover_total():
    total_names = set(class_maps.get_class_map("total").values())
    part_names = set()
    for part, labels in class_maps.class_map_5_parts.items():
        if part == "test":
            continue
        part_names |= set(labels.values())
    assert part_names == total_names


def test_taskid_to_partname_matches_total_ids():
    for tid in TASKS["total"].task_ids:
        assert tid in class_maps.map_taskid_to_partname


def test_task_registry_shapes():
    t = get_task("total")
    assert t.task_ids == (291, 292, 293, 294, 295)
    assert t.resample == (1.5, 1.5, 1.5)
    fast = get_task("total", fast=True)
    assert fast.task_ids == (297,) and fast.resample == (3.0, 3.0, 3.0)
    bp = get_task("body_parts")
    assert bp.folds == (0, 1, 2, 3, 4) and bp.resample_only_thickness
    assert get_task("body_parts", fast=True).folds == (0,)


def test_bca_definitions():
    regions = class_maps.bca_body_regions()
    assert regions["PERICARDIUM"] == 7 and len(regions) == 11
    rules = class_maps.bca_tissue_rules()
    vat = next(r for r in rules if r["tissue"] == "VAT")
    assert vat["region"] == "ABDOMINAL_CAVITY" and vat["hu_range"] == "ADIPOSE_TISSUE"
    assert class_maps.bca_hu_ranges()["ADIPOSE_TISSUE"] == (-190, -30)


def test_heartchambers_license_gated():
    assert TASKS["heartchambers_highres"].license_required
    assert BCA_TASKS["body_regions"].task_ids == (542,)
