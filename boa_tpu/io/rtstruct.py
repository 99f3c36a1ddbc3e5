"""DICOM RTSTRUCT export: segmentation masks → contour sequences.

Parity: `totalsegmentator/dicom_io.py` RTSTRUCT output via rt_utils —
per-label, per-slice planar contours extracted with cv2.findContours and
mapped to patient coordinates through the series geometry.
"""

from __future__ import annotations

import logging
from datetime import datetime
from typing import Sequence

import numpy as np

from boa_tpu.io import dicom
from boa_tpu.io.dicom import Dataset, generate_uid

logger = logging.getLogger(__name__)

RTSTRUCT_STORAGE = "1.2.840.10008.5.1.4.1.1.481.3"

# RTSTRUCT-specific tags
dicom.DICT.update({
    "StructureSetLabel": (0x3006, 0x0002, "SH"),
    "StructureSetDate": (0x3006, 0x0008, "DA"),
    "StructureSetTime": (0x3006, 0x0009, "TM"),
    "StructureSetROISequence": (0x3006, 0x0020, "SQ"),
    "ROIContourSequence": (0x3006, 0x0039, "SQ"),
    "RTROIObservationsSequence": (0x3006, 0x0080, "SQ"),
    "ROINumber": (0x3006, 0x0022, "IS"),
    "ROIName": (0x3006, 0x0026, "LO"),
    "ROIGenerationAlgorithm": (0x3006, 0x0036, "CS"),
    "ReferencedFrameOfReferenceUID": (0x3006, 0x0024, "UI"),
    "ROIDisplayColor": (0x3006, 0x002A, "IS"),
    "ContourSequence": (0x3006, 0x0040, "SQ"),
    "ContourGeometricType": (0x3006, 0x0042, "CS"),
    "NumberOfContourPoints": (0x3006, 0x0046, "IS"),
    "ContourData": (0x3006, 0x0050, "DS"),
    "ContourImageSequence": (0x3006, 0x0016, "SQ"),
    "ReferencedROINumber": (0x3006, 0x0084, "IS"),
    "ObservationNumber": (0x3006, 0x0082, "IS"),
    "RTROIInterpretedType": (0x3006, 0x00A4, "CS"),
    "ROIInterpreter": (0x3006, 0x00A6, "PN"),
    "ReferencedFrameOfReferenceSequence": (0x3006, 0x0010, "SQ"),
})
dicom.TAG_TO_KEYWORD.update(
    {(g, e): kw for kw, (g, e, _vr) in dicom.DICT.items()})
dicom.TAG_TO_VR.update(
    {(g, e): vr for kw, (g, e, vr) in dicom.DICT.items()})


def _slice_contours(mask2d: np.ndarray) -> list[np.ndarray]:
    """Contours of a 2D (x, y) mask in pixel coordinates — outer AND hole
    boundaries (rt_utils emits hole contours via the hierarchy; dropping
    them would rasterize a ring back as a solid disk)."""
    import cv2

    # cv2 works on (rows=y, cols=x)
    found, _ = cv2.findContours(mask2d.T.astype(np.uint8),
                                cv2.RETR_CCOMP, cv2.CHAIN_APPROX_SIMPLE)
    out = []
    for c in found:
        pts = c[:, 0, :]  # (n, 2) as (x=col, y=row)... cv2 gives (x, y)
        if len(pts) >= 3:
            out.append(pts.astype(np.float64))
    return out


def write_rtstruct(seg: np.ndarray, label_map: dict[int, str],
                   source_headers: Sequence[Dataset],
                   colors: dict[int, tuple[int, int, int]] | None = None,
                   label: str = "BOA-TPU") -> Dataset:
    """Build an RTSTRUCT dataset from an (x, y, z) label volume aligned to
    the given z-sorted CT slice headers."""
    first = source_headers[0]
    ds = Dataset()
    sop_uid = generate_uid()
    meta = Dataset()
    meta.MediaStorageSOPClassUID = RTSTRUCT_STORAGE
    meta.MediaStorageSOPInstanceUID = sop_uid
    meta.TransferSyntaxUID = dicom.EXPLICIT_VR_LE
    ds.file_meta = meta
    ds.SOPClassUID = RTSTRUCT_STORAGE
    ds.SOPInstanceUID = sop_uid
    for kw in ("PatientName", "PatientID", "PatientBirthDate", "PatientSex",
               "StudyDate", "StudyTime", "AccessionNumber", "StudyID",
               "StudyInstanceUID"):
        v = first.get(kw)
        if v is not None:
            setattr(ds, kw, v)
    now = datetime.now()
    ds.Modality = "RTSTRUCT"
    ds.SeriesInstanceUID = generate_uid()
    ds.SeriesNumber = 98
    ds.InstanceNumber = 1
    ds.StructureSetLabel = label
    ds.StructureSetDate = now.strftime("%Y%m%d")
    ds.StructureSetTime = now.strftime("%H%M%S")
    ds.Manufacturer = "boa_tpu"
    frame_uid = first.get("FrameOfReferenceUID", generate_uid())
    fref = Dataset()
    fref.FrameOfReferenceUID = frame_uid
    ds.ReferencedFrameOfReferenceSequence = [fref]

    labels = sorted(lb for lb in np.unique(seg) if lb and lb in label_map)
    iop = np.asarray(first.get("ImageOrientationPatient")
                     or [1, 0, 0, 0, 1, 0], float)
    ps = first.get("PixelSpacing") or [1.0, 1.0]
    col_dir, row_dir = iop[:3], iop[3:]
    row_sp, col_sp = float(ps[0]), float(ps[1])

    roi_seq, contour_seq, obs_seq = [], [], []
    for num, lb in enumerate(labels, start=1):
        roi = Dataset()
        roi.ROINumber = num
        roi.ROIName = label_map[lb]
        roi.ROIGenerationAlgorithm = "AUTOMATIC"
        roi.ReferencedFrameOfReferenceUID = frame_uid
        roi_seq.append(roi)

        rc = Dataset()
        rc.ReferencedROINumber = num
        if colors and lb in colors:
            rc.ROIDisplayColor = list(colors[lb])
        contours = []
        mask3d = seg == lb
        for z in range(seg.shape[2]):
            if not mask3d[:, :, z].any():
                continue
            ipp = np.asarray(source_headers[z].get("ImagePositionPatient")
                             or [0, 0, z], float)
            for poly in _slice_contours(mask3d[:, :, z]):
                c = Dataset()
                c.ContourGeometricType = "CLOSED_PLANAR"
                c.NumberOfContourPoints = len(poly)
                pts3d = (ipp[None]
                         + poly[:, 0:1] * col_dir[None] * col_sp
                         + poly[:, 1:2] * row_dir[None] * row_sp)
                c.ContourData = [float(v) for v in pts3d.ravel()]
                img = Dataset()
                img.ReferencedSOPClassUID = source_headers[z].get(
                    "SOPClassUID", dicom.CT_IMAGE_STORAGE)
                img.ReferencedSOPInstanceUID = source_headers[z].get(
                    "SOPInstanceUID", "")
                c.ContourImageSequence = [img]
                contours.append(c)
        rc.ContourSequence = contours
        contour_seq.append(rc)

        obs = Dataset()
        obs.ObservationNumber = num
        obs.ReferencedROINumber = num
        obs.RTROIInterpretedType = "ORGAN"
        obs.ROIInterpreter = ""
        obs_seq.append(obs)

    ds.StructureSetROISequence = roi_seq
    ds.ROIContourSequence = contour_seq
    ds.RTROIObservationsSequence = obs_seq
    return ds
