"""Snapshot round-trip + HTTP server protocol tests."""

import json
import os
import threading
import urllib.request

import pytest

from .conftest import REFERENCE_ROOT, reference_available

QUERIES_DIR = os.path.join(REFERENCE_ROOT, "endToEndTests/test/queries")


@pytest.fixture(scope="session")
def snapshot_dir(example_dataset_db, tmp_path_factory):
    from lapis_silo_tpu.storage.snapshot import save_database

    out = tmp_path_factory.mktemp("snapshots")
    return save_database(example_dataset_db, str(out))


@pytest.fixture(scope="session")
def loaded_db(snapshot_dir):
    from lapis_silo_tpu.storage.snapshot import load_database

    return load_database(snapshot_dir)


def test_snapshot_roundtrip_conformance(loaded_db):
    if not reference_available():
        pytest.skip("reference data unavailable")
    for case_file in sorted(os.listdir(QUERIES_DIR)):
        with open(os.path.join(QUERIES_DIR, case_file)) as f:
            case = json.load(f)
        response = loaded_db.execute_query(json.dumps(case["query"]))
        got = json.loads(json.dumps(response["queryResult"]))
        expected = case["expectedQueryResult"]
        assert json.dumps(got, sort_keys=True) == json.dumps(
            json.loads(json.dumps(expected)), sort_keys=True
        ) or _approx_equal(expected, got), case_file


def _approx_equal(expected, actual) -> bool:
    import math

    if isinstance(expected, list) and isinstance(actual, list):
        return len(expected) == len(actual) and all(
            _approx_equal(e, a) for e, a in zip(expected, actual)
        )
    if isinstance(expected, dict) and isinstance(actual, dict):
        return set(expected) == set(actual) and all(
            _approx_equal(expected[k], actual[k]) for k in expected
        )
    if isinstance(expected, float) or isinstance(actual, float):
        return math.isclose(expected, actual, rel_tol=1e-12, abs_tol=1e-15)
    return expected == actual


@pytest.fixture(scope="session")
def server_url(snapshot_dir):
    from lapis_silo_tpu.server.http_server import DatabaseMutex, make_server
    from lapis_silo_tpu.server.watcher import DatabaseDirectoryWatcher

    mutex = DatabaseMutex()
    watcher = DatabaseDirectoryWatcher(os.path.dirname(snapshot_dir), mutex,
                                       poll_seconds=3600)
    watcher.start()
    server = make_server(mutex, port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def _request(url, method="GET", body=None):
    req = urllib.request.Request(url, method=method,
                                 data=body.encode() if body else None)
    try:
        resp = urllib.request.urlopen(req)
        return resp.status, dict(resp.headers), json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, dict(err.headers), json.loads(err.read())


def test_server_query(server_url):
    status, headers, body = _request(
        server_url + "/query", "POST",
        '{"action": {"type": "Aggregated"}, "filterExpression": {"type": "True"}}',
    )
    assert status == 200
    assert body == {"queryResult": [{"count": 100}]}
    assert headers["data-version"].isdigit()
    assert headers["Content-Type"] == "application/json"


def test_server_invalid_query(server_url):
    status, _, body = _request(
        server_url + "/query", "POST",
        '{"action": {"type": "Nope"}, "filterExpression": {"type": "True"}}',
    )
    assert status == 400
    assert body == {"error": "Bad request", "message": "Nope is not a valid action"}


def test_server_info(server_url):
    status, headers, body = _request(server_url + "/info")
    assert status == 200
    assert body["sequenceCount"] == 100
    status, _, detailed = _request(server_url + "/info?details=true")
    assert status == 200
    assert "bitmapSizePerSymbol" in detailed


def test_server_protocol_errors(server_url):
    status, _, body = _request(server_url + "/unknown-url")
    assert status == 404
    assert body == {"error": "Not found", "message": "Resource /unknown-url does not exist"}
    status, _, body = _request(server_url + "/query")
    assert status == 405
    assert body == {
        "error": "Method not allowed",
        "message": "GET is not allowed on resource /query",
    }
    status, _, body = _request(server_url + "/query", "POST", "{ not a valid json")
    assert status == 400
    assert body["error"] == "Bad request"
    assert body["message"].startswith("The query was not a valid JSON")
