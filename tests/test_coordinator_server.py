"""Public HTTP surface of the multi-host coordinator: /query + /info(?details)
answered by fan-out + merge over replicated workers, with the protocol
details of the single-host server (data-version header, 400/404/405
bodies)."""

import json
import urllib.error
import urllib.request

import pytest


def _get(url):
    with urllib.request.urlopen(url) as resp:
        return json.loads(resp.read()), dict(resp.headers)


def _post(url, payload: str):
    req = urllib.request.Request(url, data=payload.encode(), method="POST")
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read()), dict(resp.headers)


@pytest.fixture()
def coordinator_http(tmp_path):
    from lapis_silo_tpu.parallel.multihost import (
        Coordinator,
        FlipController,
        StagedSnapshotWatcher,
        start_replicated_worker,
    )
    from lapis_silo_tpu.server.http_server import (
        DatabaseMutex,
        make_coordinator_server,
    )
    from lapis_silo_tpu.storage.database import DataVersion
    from lapis_silo_tpu.storage.snapshot import save_database
    from lapis_silo_tpu.testing import synthetic_database

    # three shard directories: coordinator-local + two workers
    dbs = [synthetic_database(n_rows=32, length=64, n_partitions=1, seed=s)
           for s in range(3)]
    dirs = [str(tmp_path / f"host{i}") for i in range(3)]
    for db, d in zip(dbs, dirs):
        db.data_version = DataVersion("1000000001")
        save_database(db, d)

    workers = [start_replicated_worker(d, start_watcher=False)
               for d in dirs[1:]]
    urls = [f"http://127.0.0.1:{s.server_address[1]}" for s, _w, _m in workers]
    mutex = DatabaseMutex()
    local_watcher = StagedSnapshotWatcher(dirs[0], mutex)
    local_watcher.check_once()
    for _s, w, _m in workers:
        w.check_once()
    controller = FlipController(urls, local_watcher=local_watcher)
    assert controller.check_once() == "1000000001"

    coordinator = Coordinator(mutex, urls, include_local=True)
    server = make_coordinator_server(coordinator, port=0)
    import threading

    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base
    server.shutdown()
    for s, _w, _m in workers:
        s.shutdown()


def test_coordinator_query_and_info(coordinator_http):
    base = coordinator_http
    result, headers = _post(base + "/query", json.dumps(
        {"action": {"type": "Aggregated"}, "filterExpression": {"type": "True"}}
    ))
    assert result == {"queryResult": [{"count": 3 * 32}]}
    assert headers["data-version"] == "1000000001"

    info, headers = _get(base + "/info")
    assert info["sequenceCount"] == 3 * 32
    assert headers["data-version"] == "1000000001"

    detailed, _ = _get(base + "/info?details=true")
    # reference detailed-info shape; numeric leaves sum across the 3 hosts
    assert set(detailed) == {"bitmapSizePerSymbol",
                             "bitmapContainerSizePerGenomeSection"}
    assert all(v > 0 for v in detailed["bitmapSizePerSymbol"].values())


def test_coordinator_protocol_errors(coordinator_http):
    base = coordinator_http
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(base + "/query", "{not json")
    assert err.value.code == 400
    body = json.loads(err.value.read())
    assert body["error"] == "Bad request"

    with pytest.raises(urllib.error.HTTPError) as err:
        _get(base + "/query")
    assert err.value.code == 405

    with pytest.raises(urllib.error.HTTPError) as err:
        _get(base + "/nope")
    assert err.value.code == 404


def test_coordinator_mutations_and_groupby(coordinator_http):
    base = coordinator_http
    result, _ = _post(base + "/query", json.dumps({
        "action": {"type": "Mutations", "minProportion": 0.05,
                   "orderByFields": ["mutation"], "limit": 5},
        "filterExpression": {"type": "True"},
    }))
    assert "queryResult" in result
    result, _ = _post(base + "/query", json.dumps({
        "action": {"type": "Aggregated", "groupByFields": ["country"],
                   "orderByFields": ["country"]},
        "filterExpression": {"type": "True"},
    }))
    assert sum(r["count"] for r in result["queryResult"]) == 3 * 32
