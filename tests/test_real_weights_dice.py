"""Weights-gated end-to-end Dice test against the reference implementation.

Mirrors the reference's committed-example parity hook
(`totalsegmentator/nnunet.py:560-578` + nnunetv2's
`tests/example_data/`): when REAL published weights are installed under
``BOA_WEIGHTS_PATH`` and a reference segmentation of the committed
example CT is available, run the actual fast-total pipeline end to end
and assert Dice >= 0.999 (BASELINE.md parity target) per foreground
class. Otherwise the test SKIPS with a loud reason — it is never
silently green.

Producing the oracle (one-time, on any machine with the reference
installed): run the reference on the committed CT and save the
multilabel output, e.g.

    TotalSegmentator -i tests/data/example_ct.nii.gz \
        -o /tmp/ref_out --ml --fast
    cp /tmp/ref_out.nii.gz tests/data/example_ct_total_fast_reference.nii.gz

or point ``BOA_REFERENCE_SEG`` at an existing reference output for the
same CT.
"""

import os
from pathlib import Path

import numpy as np
import pytest

DATA = Path(__file__).parent / "data"
EXAMPLE_CT = DATA / "example_ct.nii.gz"
COMMITTED_REF = DATA / "example_ct_total_fast_reference.nii.gz"


def _real_weights_root() -> Path | None:
    root = os.environ.get("BOA_WEIGHTS_PATH")
    if not root:
        return None
    matches = sorted(Path(root).glob("Dataset297_*"))
    if not matches:
        return None
    ckpts = list(matches[0].rglob("fold_0/checkpoint_final.*"))
    return Path(root) if ckpts else None


def _reference_seg_path() -> Path | None:
    env = os.environ.get("BOA_REFERENCE_SEG")
    if env and Path(env).exists():
        return Path(env)
    if COMMITTED_REF.exists():
        return COMMITTED_REF
    return None


@pytest.mark.weights
@pytest.mark.integration
def test_fast_total_dice_vs_reference():
    root = _real_weights_root()
    if root is None:
        pytest.skip("real fast-total weights not installed under "
                    "BOA_WEIGHTS_PATH (Dataset297 fold_0 checkpoint missing) "
                    "— Dice parity NOT verified in this run")
    ref_path = _reference_seg_path()
    if ref_path is None:
        pytest.skip(f"reference segmentation missing: commit "
                    f"{COMMITTED_REF} (see module docstring) or set "
                    f"BOA_REFERENCE_SEG — Dice parity NOT verified")

    from boa_tpu.io import nifti
    from boa_tpu.python_api import totalsegmentator

    seg_img = totalsegmentator(EXAMPLE_CT, None, ml=True, fast=True,
                               skip_saving=True, quiet=True)
    ours = np.asarray(seg_img.data)
    ref = np.asarray(nifti.load(ref_path).data)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)

    labels = sorted(set(np.unique(ref)) | set(np.unique(ours)))
    dices = {}
    for lb in labels:
        if lb == 0:
            continue
        a = ours == lb
        b = ref == lb
        denom = int(a.sum()) + int(b.sum())
        if denom == 0:
            continue
        dices[int(lb)] = 2.0 * int((a & b).sum()) / denom
    assert dices, "reference segmentation has no foreground labels"
    macro = float(np.mean(list(dices.values())))
    worst = min(dices.items(), key=lambda kv: kv[1])
    assert macro >= 0.999, (macro, worst)
