"""Model-spec / device / env resolution tests.

Mirrors the reference's pure-logic unit tests (`tests/test_config.py:16-148`).
"""

import pytest

from boa_tpu.utils.config import env_bool, env_str, resolve_device, resolve_models
from boa_tpu.utils.constants import ALL_MODELS


def test_all_models_default():
    # 'all' includes bca, which implies total and drops the standalone
    # body_parts/body_regions entries (they run inside the bca pipeline)
    expected = (set(ALL_MODELS) | {"total"}) - {"body_parts", "body_regions"}
    assert resolve_models(None) == resolve_models("all") == expected


def test_plus_split_and_dash_alias():
    assert resolve_models("total+lung-vessels") == {"total", "lung_vessels"}


def test_bca_implies_total_and_drops_parts():
    models = resolve_models("bca+body_parts")
    assert "total" in models
    assert "body_parts" not in models and "body_regions" not in models
    assert "bca" in models


def test_invalid_strict_raises():
    with pytest.raises(ValueError):
        resolve_models("nonsense", strict=True)


def test_invalid_lenient_dropped():
    assert resolve_models("total+nonsense") == {"total"}


def test_license_gating():
    assert "heartchambers_highres" not in resolve_models("all")
    # aca_ prefix, 18 chars total (bin/totalseg_set_license.py:31-34)
    ok = resolve_models("all", license_number="aca_" + "x" * 14)
    assert "heartchambers_highres" in ok


@pytest.fixture
def license_backend(monkeypatch):
    """Local mock of the reference licensing backend
    (`totalsegmentator/config.py:107-120`): POST /is_valid_license_number,
    JSON body {"license_number": ...}. 'aca_good...' validates, 'aca_err...'
    returns HTTP 500, everything else is a well-formed rejection."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            assert self.path == "/is_valid_license_number"
            body = json.loads(self.rfile.read(
                int(self.headers["Content-Length"])))
            key = body.get("license_number", "")
            if key.startswith("aca_err"):
                self.send_response(500)
                self.end_headers()
                self.wfile.write(b'{"message": "boom"}')
                return
            status = ("valid_license" if key.startswith("aca_good")
                      else "invalid_license")
            payload = json.dumps({"status": status}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):  # keep pytest output clean
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    monkeypatch.setenv("BOA_LICENSE_BACKEND",
                       f"http://127.0.0.1:{server.server_port}")
    yield server
    server.shutdown()
    thread.join(timeout=5)


def test_license_backend_validation(license_backend, monkeypatch):
    from boa_tpu.utils.config import is_valid_license

    good = "aca_good" + "x" * 10
    assert is_valid_license(good)
    assert "heartchambers_highres" in resolve_models("all",
                                                     license_number=good)
    # backend rejects a well-FORMED key the offline check would accept
    assert not is_valid_license("aca_nope" + "x" * 10)
    # server error and unreachable backend both reject (reference
    # prints-and-returns-False on any exception)
    assert not is_valid_license("aca_err_" + "x" * 10)
    port = license_backend.server_port
    license_backend.shutdown()
    license_backend.server_close()  # free the port -> connection refused
    monkeypatch.setenv("BOA_LICENSE_BACKEND", f"http://127.0.0.1:{port}")
    assert not is_valid_license(good)


def test_license_offline_format_only(monkeypatch):
    from boa_tpu.utils.config import is_valid_license

    monkeypatch.delenv("BOA_LICENSE_BACKEND", raising=False)
    assert is_valid_license("aca_" + "x" * 14)
    assert not is_valid_license("aca_short")
    assert not is_valid_license(None)


def test_resolve_device_aliases(monkeypatch):
    monkeypatch.delenv("DEVICE", raising=False)
    monkeypatch.delenv("NVIDIA_ID", raising=False)
    assert resolve_device("cuda") == "tpu"
    assert resolve_device("gpu:1") == "tpu:1"
    assert resolve_device("cpu") == "cpu"
    with pytest.raises(ValueError):
        resolve_device("quantum")


def test_env_parsing(monkeypatch):
    monkeypatch.setenv("X_BOOL", "TRUE")
    monkeypatch.setenv("X_TODO", "TODO")
    monkeypatch.setenv("X_EMPTY", "")
    assert env_bool("X_BOOL") is True
    assert env_bool("X_MISSING", default=True) is True
    assert env_str("X_TODO") is None
    assert env_str("X_EMPTY", "fallback") == "fallback"


def test_resolve_models_empty_string_means_all():
    """Docker-compose pass-through of an unset host var yields '' — the
    reference's `if not spec` treats it as 'all'."""
    from boa_tpu.utils.config import resolve_models

    assert resolve_models("") == resolve_models(None)
    assert len(resolve_models("")) > 3
