"""PACS layer tests, mirroring the reference's three-tier shape
(`tests/test_gating.py` fake-orthanc backend, `tests/test_scripts_util.py`
naming tests) plus a full worker integration run against a stdlib HTTP
server standing in for Orthanc."""

import json
import sys
import threading
import types
from http.server import BaseHTTPRequestHandler, HTTPServer
from pathlib import Path

import numpy as np
import pytest

from boa_tpu.pacs.util import (_process_info_element, _replace_umlauts,
                               get_naming_scheme, upsert_sql)


# ------------------------------------------------------------ naming scheme
def test_replace_umlauts():
    assert _replace_umlauts("Müller-Lüdenscheidt") == "Mueller-Luedenscheidt"
    assert _replace_umlauts("Åse Øberg æther") == "Aese Oeberg aether"
    assert _replace_umlauts("Straße") == "Strasse"
    assert _replace_umlauts("café naïve") == "cafe naive"


def test_process_info_element():
    tags = {"StudyDate": "20260101", "AccessionNumber": "A/B 1",
            "StudyDescription": "Thorax Röntgen"}
    out = _process_info_element(tags, ["StudyDate", "AccessionNumber",
                                       "StudyDescription"])
    assert out == "20260101_A_B_1_Thorax_Roentgen"
    out2 = _process_info_element({}, ["SeriesNumber"])
    assert out2 == "UnknownSeriesNumber"


def test_get_naming_scheme():
    tags = {"CalledAET": "BOA", "StudyDate": "20260101",
            "AccessionNumber": "ACC", "StudyDescription": "CT Abdomen",
            "SeriesNumber": "2", "SeriesDescription": "venös",
            "PatientName": "Müller", "PatientBirthDate": "19500101"}
    assert get_naming_scheme(tags) == \
        "/BOA/20260101_ACC_CT_Abdomen/2_venoes/"
    assert get_naming_scheme(tags, patient_info=True) == \
        "/BOA/Mueller_19500101/20260101_ACC_CT_Abdomen/2_venoes/"


def test_upsert_sql():
    q = upsert_sql(["task_id", "computed", "total_time"])
    assert "INSERT INTO boa_entries (task_id, computed, total_time)" in q
    assert "ON CONFLICT (task_id) DO UPDATE" in q
    assert "computed = EXCLUDED.computed" in q
    with pytest.raises(ValueError):
        upsert_sql(["task_id", "bad-col; DROP"])


# ------------------------------------------------------------ gating (fake orthanc)
@pytest.fixture()
def fake_orthanc(monkeypatch):
    mod = types.ModuleType("orthanc")
    mod.logs = []
    mod.deleted = []
    mod.LogWarning = mod.logs.append
    mod.RestApiGet = lambda path: "{}"
    mod.RestApiDelete = mod.deleted.append
    mod.RegisterOnChangeCallback = lambda cb: None

    class ChangeType:
        STABLE_SERIES = 9

    mod.ChangeType = ChangeType
    monkeypatch.setitem(sys.modules, "orthanc", mod)
    sys.modules.pop("boa_tpu.pacs.on_change", None)
    yield mod
    sys.modules.pop("boa_tpu.pacs.on_change", None)


def test_gating(fake_orthanc):
    from boa_tpu.pacs.on_change import generate_task

    good_tags = {"Modality": "CT", "ImageType": ["ORIGINAL", "AXIAL"]}
    assert generate_task({"Instances": list(range(20))}, good_tags)
    assert not generate_task({"Instances": [1, 2]}, good_tags)
    assert not generate_task({"Instances": list(range(20))},
                             {"Modality": "MR"})
    assert not generate_task(
        {"Instances": list(range(20))},
        {"Modality": "CT", "ImageType": ["LOCALIZER"]})
    # missing tags pass (conservative accept, like the reference)
    assert generate_task({"Instances": list(range(20))}, {})


def test_on_change_enqueues(fake_orthanc, monkeypatch):
    import boa_tpu.pacs.on_change as oc

    series_info = {"Instances": [f"i{k}" for k in range(15)]}
    tags = {"Modality": "CT", "ImageType": ["AXIAL"],
            "SeriesDescription": "test"}

    def rest_get(path):
        if path.startswith("/series/"):
            return json.dumps(series_info)
        return json.dumps(tags)

    fake_orthanc.RestApiGet = rest_get
    queued = []
    monkeypatch.setattr(oc.analyze_stable_series, "delay",
                        lambda resource_id: queued.append(resource_id) or
                        types.SimpleNamespace(id="t1"))
    oc.on_change(fake_orthanc.ChangeType.STABLE_SERIES, 0, "res-1")
    assert queued == ["res-1"]
    assert fake_orthanc.deleted == []

    # rejected series gets deleted
    series_info["Instances"] = ["i0"]
    oc.on_change(fake_orthanc.ChangeType.STABLE_SERIES, 0, "res-2")
    assert fake_orthanc.deleted == ["/series/res-2"]


# ------------------------------------------------------------ worker integration
class _FakeOrthancHandler(BaseHTTPRequestHandler):
    series_files: dict[str, bytes] = {}
    deleted: list[str] = []

    def log_message(self, *a):
        pass

    def do_GET(self):
        if self.path.startswith("/series/"):
            body = json.dumps(
                {"Instances": list(self.series_files.keys())}).encode()
        elif "metadata" in self.path:
            body = json.dumps({"CalledAET": "BOA"}).encode()
        elif "simplified-tags" in self.path:
            body = json.dumps({
                "StudyDate": "20260101", "AccessionNumber": "ACC1",
                "StudyDescription": "CT Thorax", "SeriesNumber": "3",
                "SeriesDescription": "axial"}).encode()
        elif "/file" in self.path:
            inst = self.path.split("/")[2]
            body = self.series_files[inst]
        else:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_DELETE(self):
        type(self).deleted.append(self.path)
        self.send_response(200)
        self.send_header("Content-Length", "0")
        self.end_headers()


def test_worker_integration(tmp_path, monkeypatch, rng):
    from boa_tpu.io import dicom_io, nifti
    from boa_tpu.pacs.worker import run_analyze_stable_series

    # build a small series and serve it
    data = np.full((24, 24, 12), -1000, np.int16)
    data[6:18, 6:18, :] = 50
    img = nifti.NiftiImage(data=data, affine=np.diag([-1.5, -1.5, 3.0, 1.0]))
    files = dicom_io.write_ct_series(img, tmp_path / "dicoms")
    _FakeOrthancHandler.series_files = {f"inst{k}": p.read_bytes()
                                        for k, p in enumerate(files)}
    _FakeOrthancHandler.deleted = []
    srv = HTTPServer(("127.0.0.1", 0), _FakeOrthancHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        monkeypatch.setenv("ORTHANC_URL", "http://127.0.0.1")
        monkeypatch.setenv("ORTHANC_PORT", str(srv.server_address[1]))
        monkeypatch.setenv("ORTHANC_USERNAME", "u")
        monkeypatch.setenv("ORTHANC_PASSWORD", "p")
        monkeypatch.setenv("PACS_MODEL", "total")
        storage = tmp_path / "storage"
        storage.mkdir()

        def fake_analyze(input_folder, processed_output_folder,
                         excel_output_folder, models, **kw):
            from boa_tpu.commands import analyze_ct

            def fake(vol, spacing, task_id):
                seg = np.zeros(vol.shape, np.uint8)
                seg[8:16, 8:16, 2:10] = 1
                return seg

            return analyze_ct(
                input_folder=input_folder,
                processed_output_folder=processed_output_folder,
                excel_output_folder=excel_output_folder, models=models,
                bca_pdf=False, compute_contrast_information=False,
                fast_total=True, fake_predict=fake)

        res = run_analyze_stable_series(
            "series-1", analyze_fn=fake_analyze, storage_root=storage)
        assert res["computed"] is True
        out = Path(res["outputs"])
        assert out.exists() and out.suffix == ".xlsx"
        assert out.name == "ACC1_3_axial.xlsx"
        assert (out.parent / "total.nii.gz").exists()
        assert _FakeOrthancHandler.deleted == ["/series/series-1"]
    finally:
        srv.shutdown()


def test_naming_scheme_neutralizes_traversal():
    """A sender-controlled AET (or dot-only tag) must not escape the
    storage root."""
    tags = {"CalledAET": "..", "StudyDate": "..", "AccessionNumber": "A1",
            "StudyDescription": "desc", "SeriesNumber": "2",
            "SeriesDescription": "ser"}
    path = get_naming_scheme(tags)
    assert ".." not in path.split("/")
    tags["CalledAET"] = "BOA AET/evil"
    assert "/evil" not in get_naming_scheme(tags)[1:].split("/", 1)[0]
