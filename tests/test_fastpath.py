"""Count fast path: native body matcher + Python batch drainer.

The reference serves queries entirely in native code
(src/silo_api/query_handler.cpp:22-74); our split is native matching
(native/silo_http.cpp) + one Python drainer (server/fastpath.py). These
tests pin the contract: registered count bodies bypass the Python router
byte-identically, non-count bodies never register, snapshot swaps are
immediately visible, and the batch path survives concurrency.
"""

import http.client
import json
import threading
import time

import pytest

from lapis_silo_tpu.server.http_server import DatabaseMutex
from lapis_silo_tpu.server.router import DatabaseBackend


class CountingBackend(DatabaseBackend):
    """DatabaseBackend that counts slow-path resolves (each routed request
    resolves exactly once; fast-path answers never resolve)."""

    def __init__(self, mutex):
        super().__init__(mutex)
        self.resolves = 0

    def resolve(self):
        self.resolves += 1
        return super().resolve()


@pytest.fixture(scope="module")
def served(example_dataset_db):
    from lapis_silo_tpu.server.native_http import (
        NativeHTTPServer,
        native_http_available,
    )

    if not native_http_available():
        pytest.skip("native HTTP library unavailable")
    mutex = DatabaseMutex(example_dataset_db)
    backend = CountingBackend(mutex)
    server = NativeHTTPServer(backend, port=0)
    if server._fastpath is None:
        pytest.skip("fast path unavailable (stale libsilo_http.so)")
    yield server, backend, mutex
    server.shutdown()


def _request(port, body, conn=None, path="/query"):
    own = conn is None
    if own:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", path, body=body,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    headers = {k.lower(): v for k, v in resp.getheaders()}
    if own:
        conn.close()
    return resp.status, headers, data


def _query(filter_expr, action=None):
    return json.dumps({
        "action": action or {"type": "Aggregated"},
        "filterExpression": filter_expr,
    })


def _wait_fast(port, body, backend, deadline=30.0):
    """Send `body` until an answer arrives without a slow-path resolve
    (registration is asynchronous wrt the first response); returns that
    fast-path response."""
    end = time.time() + deadline
    while time.time() < end:
        before = backend.resolves
        status, headers, data = _request(port, body)
        if backend.resolves == before:
            return status, headers, data
        time.sleep(0.05)
    raise AssertionError("fast path never engaged")


def test_fastpath_bypasses_python_byte_identically(served):
    server, backend, _mutex = served
    port = server.server_address[1]
    body = _query({"type": "True"})
    s0, h0, d0 = _request(port, body)  # slow path (also registers)
    assert s0 == 200 and json.loads(d0) == {"queryResult": [{"count": 100}]}
    sf, hf, df = _wait_fast(port, body, backend)
    assert (sf, df) == (s0, d0)
    assert hf.get("data-version") == h0.get("data-version")
    assert hf["content-type"] == "application/json"
    # ten more: zero slow-path resolves, identical bytes every time
    before = backend.resolves
    for _ in range(10):
        s, h, d = _request(port, body)
        assert (s, d) == (s0, d0)
        assert h.get("data-version") == h0.get("data-version")
    assert backend.resolves == before


def test_fastpath_matches_slow_path_across_filters(served):
    server, backend, _mutex = served
    port = server.server_address[1]
    filters = [
        {"type": "NucleotideEquals", "position": 25, "symbol": "C"},
        {"type": "DateBetween", "column": "date",
         "from": "2021-01-01", "to": "2021-12-31"},
        {"type": "And", "children": [
            {"type": "StringEquals", "column": "country", "value": "Switzerland"},
            {"type": "Not", "child": {"type": "HasNucleotideMutation",
                                      "position": 25}},
        ]},
        {"type": "Or", "children": [
            {"type": "PangoLineage", "column": "pango_lineage",
             "value": "B.1.1.7", "includeSublineages": True},
            {"type": "AminoAcidEquals", "sequenceName": "E",
             "position": 3, "symbol": "T"},
        ]},
    ]
    for f in filters:
        body = _query(f)
        s0, h0, d0 = _request(port, body)
        assert s0 == 200, d0
        sf, hf, df = _wait_fast(port, body, backend)
        assert (sf, df) == (s0, d0), f
        assert hf.get("data-version") == h0.get("data-version")


def test_non_count_shapes_never_register(served):
    server, backend, _mutex = served
    port = server.server_address[1]
    bodies = [
        _query({"type": "True"},
               action={"type": "Aggregated", "groupByFields": ["country"]}),
        _query({"type": "True"},
               action={"type": "Details", "fields": ["gisaid_epi_isl"],
                       "limit": 3, "orderByFields": ["gisaid_epi_isl"]}),
        _query({"type": "True"}, action={"type": "Aggregated", "offset": 1}),
    ]
    for body in bodies:
        s0, _h0, d0 = _request(port, body)
        assert s0 == 200, d0
        before = backend.resolves
        for _ in range(4):
            s, _h, d = _request(port, body)
            assert s == 200 and d == d0
        assert backend.resolves == before + 4, body  # every one slow-path


def test_snapshot_swap_is_immediately_visible(served):
    from lapis_silo_tpu.storage.database import Database

    server, backend, mutex = served
    port = server.server_address[1]
    original = mutex.get_database()
    body = _query({"type": "True"})
    _request(port, body)
    _wait_fast(port, body, backend)  # registered under the original snapshot
    try:
        mutex.set_database(Database.empty())
        # The swap listener cleared the native map synchronously: the very
        # next request must answer from the NEW snapshot via the slow path.
        s, h, d = _request(port, body)
        assert s == 200
        assert json.loads(d) == {"queryResult": [{"count": 0}]}
    finally:
        mutex.set_database(original)
    # swap back: the fast path re-registers for the restored snapshot
    s0, _h0, d0 = _request(port, body)
    assert json.loads(d0) == {"queryResult": [{"count": 100}]}
    sf, _hf, df = _wait_fast(port, body, backend)
    assert (sf, df) == (s0, d0)


def test_fastpath_concurrent_hammer(served):
    server, backend, _mutex = served
    port = server.server_address[1]
    body = _query({"type": "NucleotideEquals", "position": 1000, "symbol": "A"})
    s0, _h0, d0 = _request(port, body)
    assert s0 == 200
    _wait_fast(port, body, backend)
    errors = []

    def hammer():
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            for _ in range(25):
                s, _h, d = _request(port, body, conn=conn)
                assert s == 200 and d == d0
            conn.close()
        except Exception as ex:  # noqa: BLE001
            errors.append(ex)

    before = backend.resolves
    threads = [threading.Thread(target=hammer) for _ in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert backend.resolves == before  # 400 requests, zero slow-path


def test_deep_pipeline_survives_swaps_under_load(example_dataset_db,
                                                 monkeypatch):
    """SILO_FASTPATH_DEPTH=3: several batches in flight while the snapshot
    swaps underneath. Every response must be internally consistent — the
    bytes of either the old snapshot's answer or the new one's — and the
    fast path must re-engage for the restored snapshot afterwards."""
    from lapis_silo_tpu.server.native_http import (
        NativeHTTPServer,
        native_http_available,
    )
    from lapis_silo_tpu.storage.database import Database

    if not native_http_available():
        pytest.skip("native HTTP library unavailable")
    monkeypatch.setenv("SILO_FASTPATH_DEPTH", "3")
    mutex = DatabaseMutex(example_dataset_db)
    backend = CountingBackend(mutex)
    server = NativeHTTPServer(backend, port=0)
    if server._fastpath is None:
        server.shutdown()
        pytest.skip("fast path unavailable (stale libsilo_http.so)")
    try:
        port = server.server_address[1]
        bodies = [_query({"type": "NucleotideEquals", "position": p,
                          "symbol": "A"}) for p in (500, 1000, 1500, 2000)]
        full = {}
        for body in bodies:
            s, _h, d = _request(port, body)
            assert s == 200
            full[body] = d
            _wait_fast(port, body, backend)
        empty_answer = json.dumps(
            {"queryResult": [{"count": 0}]}).encode()
        errors = []
        stop = threading.Event()

        def hammer(body):
            try:
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=60)
                while not stop.is_set():
                    s, _h, d = _request(port, body, conn=conn)
                    assert s == 200, d
                    assert d in (full[body], empty_answer), d
                conn.close()
            except Exception as ex:  # noqa: BLE001
                errors.append(ex)

        threads = [threading.Thread(target=hammer, args=(b,))
                   for b in bodies for _ in range(2)]
        for t in threads:
            t.start()
        try:
            for _ in range(4):
                time.sleep(0.15)
                mutex.set_database(Database.empty())
                time.sleep(0.15)
                mutex.set_database(example_dataset_db)
        finally:
            stop.set()
            for t in threads:
                t.join()
        assert not errors
        # restored snapshot: correct bytes and the fast path re-engages
        for body in bodies:
            s, _h, d = _request(port, body)
            assert s == 200 and d == full[body]
        _wait_fast(port, bodies[0], backend)
    finally:
        server.shutdown()


def test_fastpath_connection_close(served):
    import socket

    server, backend, _mutex = served
    port = server.server_address[1]
    body = _query({"type": "True"}).encode()
    _request(port, body)
    _wait_fast(port, body, backend)
    raw = (b"POST /query HTTP/1.1\r\nHost: x\r\nConnection: close\r\n"
           b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body)
    s = socket.create_connection(("127.0.0.1", port), timeout=30)
    s.sendall(raw)
    data = b""
    while True:
        chunk = s.recv(65536)
        if not chunk:
            break  # server honored Connection: close with a FIN
        data += chunk
    s.close()
    head, _, payload = data.partition(b"\r\n\r\n")
    assert b"200" in head.split(b"\r\n")[0]
    assert json.loads(payload) == {"queryResult": [{"count": 100}]}
