"""Crop a CT to the body (or trunc) bounding box via a rough body model.

Parity: `totalsegmentator/bin/crop_to_body.py:17-88` — runs the 6 mm `body`
model, thresholds to body (>0) or trunc only (==1), crops the input with a
3-voxel addon and saves the cropped image plus the bbox as a JSON sidecar
so the crop can be undone later.
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

import numpy as np

from boa_tpu.io import nifti
from boa_tpu.io.nifti import NiftiImage
from boa_tpu.ops import cropping
from boa_tpu.weights.store import ModelStore

logger = logging.getLogger(__name__)


def crop_to_body(img: NiftiImage, *, only_trunc: bool = False,
                 store: ModelStore | None = None,
                 fake_predict=None) -> tuple[NiftiImage, list[list[int]]]:
    """(cropped image, bbox) — the library form of the tool."""
    from boa_tpu.inference.pipeline import predict_image

    store = store or ModelStore()
    rough = predict_image(img, "body", store, fast=True,
                          fake_predict=fake_predict)
    data = np.asarray(rough.seg.data)
    mask = (data == 1) if only_trunc else (data > 0.5)
    body = NiftiImage(data=mask.astype(np.uint8),
                      affine=rough.seg.affine.copy())
    cropped, bbox = cropping.crop_to_mask(img, body, addon_mm=(3, 3, 3),
                                          dtype=np.int32)
    return cropped, [[int(b) for b in ax] for ax in np.asarray(bbox)]


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Crop input image to body.")
    parser.add_argument("-i", dest="input", type=Path, required=True,
                        help="CT nifti image")
    parser.add_argument("-o", dest="output", type=Path, required=True,
                        help="Cropped nifti image")
    parser.add_argument("-t", "--only_trunc", action="store_true",
                        default=False, help="Crop to trunc instead of "
                        "entire body.")
    parser.add_argument("-nr", "--nr_thr_resamp", type=int, default=1)
    parser.add_argument("-ns", "--nr_thr_saving", type=int, default=6)
    parser.add_argument("-d", "--device", default="tpu")
    parser.add_argument("-q", "--quiet", action="store_true", default=False)
    parser.add_argument("-v", "--verbose", action="store_true", default=False)
    args = parser.parse_args(argv)

    img = nifti.load(args.input)
    cropped, bbox = crop_to_body(img, only_trunc=args.only_trunc)
    nifti.save(cropped, args.output)
    sidecar = args.output.with_name(args.output.name.split(".")[0]
                                    + "_bbox.json")
    sidecar.write_text(json.dumps({"bbox": bbox,
                                   "original_shape": list(img.shape)}))
    if not args.quiet:
        print(f"Saved cropped image to {args.output} (bbox {bbox})")


if __name__ == "__main__":
    main()
