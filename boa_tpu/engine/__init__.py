"""Model-engine auxiliaries: experiment planning, ensembling, evaluation,
postprocessing determination, benchmarking.

Parity: `nnunetv2/experiment_planning/`, `ensembling/ensemble.py`,
`evaluation/evaluate_predictions.py`,
`postprocessing/remove_connected_components.py`,
`training/.../benchmarking/` (SURVEY.md §2.3 rows 14-16).
"""

from boa_tpu.engine.ensembling import (  # noqa: F401,E402
    apply_postprocessing,
    determine_postprocessing,
    ensemble_probabilities,
    ensemble_segmentations,
    find_best_configuration,
)
from boa_tpu.engine.evaluation import evaluate_folder_arrays  # noqa: F401,E402
from boa_tpu.engine.fingerprint import extract_fingerprint  # noqa: F401,E402
from boa_tpu.engine.planner import plan_experiment  # noqa: F401,E402
