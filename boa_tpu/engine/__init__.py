"""Model-engine auxiliaries: experiment planning, ensembling, evaluation,
postprocessing determination, benchmarking.

Parity: `nnunetv2/experiment_planning/`, `ensembling/ensemble.py`,
`evaluation/evaluate_predictions.py`,
`postprocessing/remove_connected_components.py`,
`training/.../benchmarking/` (SURVEY.md §2.3 rows 14-16).
"""
