"""Orthanc Python-plugin callback.

Parity: `scripts/on_change_callback.py` — on STABLE_SERIES: gate the
series (≥10 instances, Modality CT, AXIAL in ImageType), enqueue the
worker task, log rejects to Postgres, delete rejected series. The
`orthanc` module is provided by the Orthanc runtime; tests stub it
(reference `tests/test_gating.py:23-34` fake-backend pattern).
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from typing import Any

import orthanc  # provided by the Orthanc python plugin runtime

from boa_tpu.pacs.util import get_db_connection, write_to_postgres
from boa_tpu.pacs.worker import analyze_stable_series

IMPORTANT_INFOS = [
    "StudyDate",
    "AccessionNumber",
    "SeriesNumber",
    "SeriesDescription",
]


def summarize_important_info(dicom_tags: dict[str, Any]) -> str:
    info_text = ""
    for info in IMPORTANT_INFOS:
        if info in dicom_tags:
            info_text += f"{info}: {dicom_tags[info]}\n"
        else:
            info_text += f"{info}: Unknown\n"
    return info_text


def generate_task(series_info: dict[str, Any], dicom_tags: dict[str, Any],
                  minimum_images: int = 10) -> bool:
    """Series gating (`on_change_callback.py:27-50`)."""
    if len(series_info["Instances"]) < minimum_images:
        orthanc.LogWarning(
            f"The series has less than {minimum_images} "
            f"instances: {len(series_info['Instances'])}")
        return False
    if "Modality" in dicom_tags and dicom_tags["Modality"] != "CT":
        orthanc.LogWarning(f"The modality is not CT: {dicom_tags['Modality']}")
        return False
    if "ImageType" in dicom_tags and not all(
            typ in dicom_tags["ImageType"] for typ in ["AXIAL"]):
        orthanc.LogWarning(
            f"The image type is not 'AXIAL': {dicom_tags['ImageType']}")
        return False
    return True


def get_max_id(connection: Any) -> Any:
    cursor = connection.cursor()
    cursor.execute("SELECT MAX(id) FROM boa_entries")
    record = cursor.fetchone()
    cursor.close()
    return record[0]


def on_change(change_type: int, _level: int, resource_id: str) -> None:
    if change_type != orthanc.ChangeType.STABLE_SERIES:
        return
    orthanc.LogWarning(f"A new stable series has been received: {resource_id}")
    series_info = json.loads(orthanc.RestApiGet(f"/series/{resource_id}"))
    dicom_tags = json.loads(orthanc.RestApiGet(
        f"/instances/{series_info['Instances'][0]}/simplified-tags"))
    orthanc.LogWarning(
        f"It has the following information:\n"
        f"{summarize_important_info(dicom_tags)}")

    relevant_infos = {
        "orthanc_timestamp": datetime.now(timezone.utc)
        .strftime("%Y-%m-%d %H:%M:%S"),
        "study_description": dicom_tags.get("StudyDescription", "Unknown"),
        "accession_number": dicom_tags.get("AccessionNumber", "Unknown"),
        "series_description": dicom_tags.get("SeriesDescription", "Unknown"),
    }
    db_conn = get_db_connection()
    try:
        if generate_task(series_info, dicom_tags):
            task_id = analyze_stable_series.delay(resource_id=resource_id)
            relevant_infos["task_id"] = str(task_id)
            write_to_postgres(db_conn, data=relevant_infos)
            orthanc.LogWarning(
                f"The task {task_id} was created for {resource_id}.")
        else:
            if db_conn is not None:
                relevant_infos["task_id"] = f"none-{get_max_id(db_conn)}"
                relevant_infos["computed"] = False
                write_to_postgres(db_conn, data=relevant_infos)
            orthanc.LogWarning(
                f"The series {resource_id} was not computed because it did "
                "not pass the filtering.")
            orthanc.RestApiDelete(f"/series/{resource_id}")
    finally:
        if db_conn is not None:
            db_conn.close()


orthanc.RegisterOnChangeCallback(on_change)
