"""1:1 replica of the reference's node e2e harness against the LIVE server.

`node` is not in this image, so every assertion in
/root/reference/endToEndTests/test/{query,info,unknownUrl}.test.js +
common.js is enumerated here and pinned over HTTP against the real server
(native epoll front-end + snapshot + watcher), same as the JS harness runs
against the reference's Poco server. Mapping:

| JS assertion | here |
|---|---|
| query.test.js:19-27 each query file: POST /query -> 200, CT json, data-version, body deep-equals {queryResult} | test_query_corpus_over_http |
| query.test.js:30-35 test case names unique | test_corpus_names_unique |
| query.test.js:40-48 each invalid file: POST -> 400, CT json, body deep-equals expectedError | test_invalid_corpus_over_http |
| query.test.js:50-57 invalid names unique | test_corpus_names_unique |
| query.test.js:60-66 GET /query -> 405 + exact body | test_get_query_405 |
| query.test.js:68-81 '{ not a valid json' -> 400 + exact nlohmann message | test_invalid_json_exact_message |
| query.test.js:83-94 missing properties -> 400 + exact message | test_missing_properties |
| query.test.js:96-112 unknown filter type -> 400 + exact message | test_unknown_filter_type |
| info.test.js:6-13 GET /info -> 200 + exact 3-field body + data-version | test_info_exact |
| info.test.js:15-83 /info?details=true: exact bitmapContainerSizeStatistic, '-'/'N'/'NOT_N_NOT_GAP' arrays, exact bitmapSizePerSymbol | test_info_details_exact |
| unknownUrl.test.js:5-11 GET /unknown-url -> 404 exact | test_unknown_url_404 |
| unknownUrl.test.js:13-19 POST /unknown-url -> 404 exact | test_unknown_url_404 |
| common.js:11-17 data-version header is a string matching /\\d{10}/ | _assert_data_version (every 200 data response) |
"""

import json
import os
import re
import threading
import urllib.error
import urllib.request

import pytest

from .conftest import REFERENCE_ROOT, reference_available

QUERIES_DIR = os.path.join(REFERENCE_ROOT, "endToEndTests/test/queries")
INVALID_DIR = os.path.join(REFERENCE_ROOT, "endToEndTests/test/invalidQueries")


@pytest.fixture(scope="module")
def server_url(example_dataset_db, tmp_path_factory):
    from lapis_silo_tpu.server.http_server import DatabaseMutex, make_server
    from lapis_silo_tpu.server.watcher import DatabaseDirectoryWatcher
    from lapis_silo_tpu.storage.snapshot import save_database

    out = tmp_path_factory.mktemp("js_parity_snapshots")
    snapshot_dir = save_database(example_dataset_db, str(out))
    mutex = DatabaseMutex()
    watcher = DatabaseDirectoryWatcher(os.path.dirname(snapshot_dir), mutex,
                                       poll_seconds=3600)
    watcher.start()
    server = make_server(mutex, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def _request(url, method="GET", body=None):
    req = urllib.request.Request(
        url, method=method, data=body.encode() if isinstance(body, str) else body)
    try:
        resp = urllib.request.urlopen(req, timeout=120)
        return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as err:
        return err.code, dict(err.headers), err.read()


def _assert_data_version(headers):
    # common.js headerToHaveDataVersion: present, a string, matches /\d{10}/
    version = headers.get("data-version")
    assert version is not None
    assert re.search(r"\d{10}", version), version


def _cases(directory):
    if not reference_available():
        pytest.skip("reference data unavailable")
    for name in sorted(os.listdir(directory)):
        with open(os.path.join(directory, name)) as f:
            yield name, json.load(f)


def test_query_corpus_over_http(server_url):
    """All 94 corpus cases THROUGH the live server: 200 + content-type +
    data-version + deep-equal body (query.test.js:19-27)."""
    n = 0
    for name, case in _cases(QUERIES_DIR):
        status, headers, raw = _request(server_url + "/query", "POST",
                                        json.dumps(case["query"]))
        assert status == 200, (name, raw[:500])
        assert headers["Content-Type"] == "application/json"
        _assert_data_version(headers)
        body = json.loads(raw)
        # chai to.deep.equal: JS numbers are doubles, so 1 == 1.0 — compare
        # with the conformance deep_equal (order-sensitive, float-tolerant)
        from .test_conformance import deep_equal

        deep_equal({"queryResult": case["expectedQueryResult"]}, body, name)
        n += 1
    assert n >= 94, n


def test_invalid_corpus_over_http(server_url):
    """All invalid cases: 400 + content-type + deep-equal error body
    (query.test.js:40-48)."""
    n = 0
    for name, case in _cases(INVALID_DIR):
        status, headers, raw = _request(server_url + "/query", "POST",
                                        json.dumps(case["query"]))
        assert status == 400, (name, raw[:500])
        assert headers["Content-Type"] == "application/json"
        assert json.loads(raw) == case["expectedError"], name
        n += 1
    assert n >= 13, n


def test_corpus_names_unique():
    """query.test.js:30-35 and :50-57."""
    for directory in (QUERIES_DIR, INVALID_DIR):
        names = [case["testCaseName"] for _, case in _cases(directory)]
        assert len(names) == len(set(names))


def test_get_query_405(server_url):
    status, headers, raw = _request(server_url + "/query")
    assert status == 405
    assert headers["Content-Type"] == "application/json"
    assert json.loads(raw) == {
        "error": "Method not allowed",
        "message": "GET is not allowed on resource /query",
    }


def test_invalid_json_exact_message(server_url):
    status, headers, raw = _request(server_url + "/query", "POST",
                                    "{ not a valid json")
    assert status == 400
    assert headers["Content-Type"] == "application/json"
    assert json.loads(raw) == {
        "error": "Bad request",
        "message": "The query was not a valid JSON: "
                   "[json.exception.parse_error.101] parse error at line 1, "
                   "column 4: syntax error while parsing object key - "
                   "invalid literal; last read: '{ no'; "
                   "expected string literal",
    }


def test_missing_properties(server_url):
    status, _h, raw = _request(
        server_url + "/query", "POST",
        json.dumps({"someJson": "but missing expected properties"}))
    assert status == 400
    assert json.loads(raw) == {
        "error": "Bad request",
        "message": "Query json must contain filterExpression and action.",
    }


def test_unknown_filter_type(server_url):
    status, _h, raw = _request(
        server_url + "/query", "POST",
        json.dumps({"action": {"type": "invalid action"},
                    "filterExpression": {"type": "invalid filter type"}}))
    assert status == 400
    assert json.loads(raw) == {
        "error": "Bad request",
        "message": "Unknown object filter type 'invalid filter type'",
    }


def test_info_exact(server_url):
    status, headers, raw = _request(server_url + "/info")
    assert status == 200
    assert headers["Content-Type"] == "application/json"
    _assert_data_version(headers)
    assert json.loads(raw) == {"nBitmapsSize": 3898, "sequenceCount": 100,
                               "totalSize": 26335659}


def test_info_details_exact(server_url):
    status, headers, raw = _request(server_url + "/info?details=true")
    assert status == 200
    _assert_data_version(headers)
    info = json.loads(raw)
    section = info["bitmapContainerSizePerGenomeSection"]
    assert section["bitmapContainerSizeStatistic"] == {
        "numberOfArrayContainers": 3065,
        "numberOfBitsetContainers": 0,
        "numberOfRunContainers": 3,
        "numberOfValuesStoredInArrayContainers": 4377,
        "numberOfValuesStoredInBitsetContainers": 0,
        "numberOfValuesStoredInRunContainers": 9,
        "totalBitmapSizeArrayContainers": 8754,
        "totalBitmapSizeBitsetContainers": 0,
        "totalBitmapSizeRunContainers": 18,
    }
    per_symbol = section["sizePerGenomeSymbolAndSection"]
    for key in ("-", "N", "NOT_N_NOT_GAP"):
        assert isinstance(per_symbol[key], list), key
    assert info["bitmapSizePerSymbol"] == {
        "-": 2648220, "A": 2635348, "B": 2631464, "C": 2634362,
        "D": 2631464, "G": 2633570, "H": 2631464, "K": 2631594,
        "M": 2631554, "N": 2631464, "R": 2631514, "S": 2631464,
        "T": 2638765, "V": 2631464, "W": 2631514, "Y": 2631494,
    }


def test_unknown_url_404(server_url):
    for method, body in (("GET", None), ("POST", "")):
        status, headers, raw = _request(server_url + "/unknown-url", method,
                                        body)
        assert status == 404, method
        assert headers["Content-Type"] == "application/json"
        assert json.loads(raw) == {
            "error": "Not found",
            "message": "Resource /unknown-url does not exist",
        }
