"""boa_tpu — TPU-native Body-and-Organ-Analysis framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
UMEssen/Body-and-Organ-Analysis (reference: /root/reference): clinical CT
analysis with 3D U-Net segmentation model families (TotalSegmentator's
117-class whole-body model, specialized organ models, BCA body-composition
models), voxel-wise measurements, Excel/PDF/JSON/PNG/DICOM-SEG outputs, a CLI
and a PACS-style worker stack.

Design stance (vs. reference `body_organ_analysis/__init__.py` + SURVEY.md §7):
the reference round-trips every volume through NIfTI tempfiles and process
pools because of Python+GIL+CUDA semantics. Here a study is decoded once on
the host, goes device-resident once, and preprocessing / sliding-window
inference / fusion / postprocessing run as jitted XLA stages on TPU.
"""

import os as _os

from boa_tpu.version import __version__


def _enable_jax_compilation_cache() -> None:
    """Persist XLA compilations across processes (first-study latency for
    total+bca is ~9 min of compiles otherwise; steady-state is seconds).
    Opt out with BOA_JAX_CACHE=0."""
    if _os.environ.get("BOA_JAX_CACHE", "1") in ("0", "false", "False"):
        return
    try:
        import jax

        cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".boa_tpu", "jax_cache"))
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_jax_compilation_cache()

__all__ = [
    "__version__",
    "analyze_ct",
    "store_dicoms",
    "store_excel",
    "totalsegmentator",
]


def __getattr__(name):  # lazy imports keep `import boa_tpu` dependency-light
    if name == "analyze_ct":
        from boa_tpu.commands import analyze_ct

        return analyze_ct
    if name in ("store_excel", "store_dicoms"):
        from boa_tpu.io import storage

        return getattr(storage, name)
    if name == "totalsegmentator":
        from boa_tpu.python_api import totalsegmentator

        return totalsegmentator
    raise AttributeError(f"module 'boa_tpu' has no attribute {name!r}")
