"""BOA compute core: orchestration, metrics → Excel rows, contrast phase.

Parity: `body_organ_analysis/compute/` (inference.py, ts_metrics.py,
bca_metrics.py, geometry.py) + the external `boa_contrast` classifier.
"""
