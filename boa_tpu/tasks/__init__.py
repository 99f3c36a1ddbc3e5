from boa_tpu.tasks.class_maps import (
    class_map,
    class_map_5_parts,
    map_taskid_to_partname,
)
from boa_tpu.tasks.registry import TASKS, BCA_TASKS, TaskConfig, get_task

__all__ = [
    "class_map",
    "class_map_5_parts",
    "map_taskid_to_partname",
    "TASKS",
    "BCA_TASKS",
    "TaskConfig",
    "get_task",
]
