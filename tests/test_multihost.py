"""Multi-host serving: partitions split over 3 worker hosts + coordinator;
the full conformance corpus must produce byte-identical results."""

import json
import os

import pytest

from .conftest import REFERENCE_ROOT, reference_available

QUERIES_DIR = os.path.join(REFERENCE_ROOT, "endToEndTests/test/queries")
INVALID_DIR = os.path.join(REFERENCE_ROOT, "endToEndTests/test/invalidQueries")


def _shard_database(db, partition_ids):
    """A Database view holding a subset of partitions (same config,
    dictionaries, reference genomes — exactly what each pod host loads)."""
    from lapis_silo_tpu.storage.database import Database

    shard = Database(db.config, db.alias_key, db.reference_genomes)
    shard.dictionaries = db.dictionaries
    shard.partitions = [db.partitions[i] for i in partition_ids]
    shard.unaligned_nuc_sequences = {
        name: [stores[i] for i in partition_ids]
        for name, stores in db.unaligned_nuc_sequences.items()
    }
    shard.data_version = db.data_version
    return shard


@pytest.fixture(scope="session")
def multihost(example_dataset_db):
    from lapis_silo_tpu.parallel.multihost import Coordinator, start_worker

    db = example_dataset_db
    n = len(db.partitions)
    third = (n + 2) // 3
    shards = [
        _shard_database(db, list(range(0, third))),
        _shard_database(db, list(range(third, 2 * third))),
        _shard_database(db, list(range(2 * third, n))),
    ]
    servers = [start_worker(shard) for shard in shards[1:]]
    urls = [f"http://127.0.0.1:{s.server_address[1]}" for s in servers]
    coordinator = Coordinator(shards[0], urls, include_local=True)
    yield coordinator
    for server in servers:
        server.shutdown()


def test_multihost_conformance(multihost):
    if not reference_available():
        pytest.skip("reference data unavailable")
    from .test_conformance import deep_equal

    for case_file in sorted(os.listdir(QUERIES_DIR)):
        with open(os.path.join(QUERIES_DIR, case_file)) as f:
            case = json.load(f)
        response = multihost.execute_query(json.dumps(case["query"]))
        deep_equal({"queryResult": case["expectedQueryResult"]}, response, case_file)


def test_multihost_info(multihost):
    info = multihost.info()
    assert info["sequenceCount"] == 100
    assert info["totalSize"] > 0


def test_multihost_invalid_queries(multihost):
    if not reference_available():
        pytest.skip("reference data unavailable")
    from lapis_silo_tpu.query.errors import QueryParseError

    for case_file in sorted(os.listdir(INVALID_DIR)):
        with open(os.path.join(INVALID_DIR, case_file)) as f:
            case = json.load(f)
        with pytest.raises(QueryParseError) as excinfo:
            multihost.execute_query(json.dumps(case["query"]))
        assert str(excinfo.value) == case["expectedError"]["message"], case_file


def test_partial_binary_frame_roundtrip():
    """Mutations partials travel as a binary frame (header JSON + raw
    int64 matrices), not JSON — the coordinator merge must see identical
    arrays after the wire roundtrip, and non-array partials pass through
    as JSON untouched."""
    import numpy as np

    from lapis_silo_tpu.parallel.multihost import (
        _PARTIAL_MAGIC, decode_partial, encode_partial)

    rng = np.random.default_rng(3)
    partial = {
        "kind": "mutation_counts", "alphabet": "nuc",
        "dataVersion": "1234567890",
        "counts": {
            "main": rng.integers(0, 1 << 40, size=(16, 300)).astype(np.int64),
            "seg2": rng.integers(0, 1 << 40, size=(16, 4)).astype(np.int64),
        },
    }
    wire = encode_partial(partial)
    assert isinstance(wire, bytes) and wire.startswith(_PARTIAL_MAGIC)
    back = decode_partial(wire)
    assert back["kind"] == "mutation_counts"
    assert back["dataVersion"] == "1234567890"
    assert set(back["counts"]) == {"main", "seg2"}
    for name in partial["counts"]:
        np.testing.assert_array_equal(back["counts"][name],
                                      partial["counts"][name])

    plain = {"kind": "count", "count": 7, "dataVersion": "1234567890"}
    assert encode_partial(plain) is plain
    assert decode_partial(json.dumps(plain).encode()) == plain


def test_concurrent_queries_batch_fanout(multihost):
    """32 concurrent public queries through the coordinator: the doorbell
    batcher coalesces them into partial_batch worker requests; every
    response must match its sequential result (including an invalid query
    failing alone without poisoning its batch-mates)."""
    from concurrent.futures import ThreadPoolExecutor

    from lapis_silo_tpu.query.errors import QueryParseError

    queries = [
        json.dumps({"action": {"type": "Aggregated"},
                    "filterExpression": {"type": "NucleotideEquals",
                                         "position": p, "symbol": s}})
        for p in (21, 22, 23, 24) for s in ("A", "C", "G", "T")
    ] + [
        json.dumps({"action": {"type": "Mutations", "minProportion": 0.5},
                    "filterExpression": {"type": "True"}}),
        json.dumps({"action": {"type": "Aggregated",
                               "groupByFields": ["country"]},
                    "filterExpression": {"type": "True"}}),
    ]
    sequential = [multihost.execute_query(q) for q in queries]
    bad = json.dumps({"action": {"type": "Aggregated"},
                      "filterExpression": {"type": "NoSuchFilter"}})

    def run(q):
        try:
            return multihost.execute_query(q)
        except QueryParseError as ex:
            return ("parse_error", str(ex))

    with ThreadPoolExecutor(max_workers=16) as pool:
        mixed = list(queries) * 2 + [bad] * 4
        results = list(pool.map(run, mixed))
    want = sequential * 2
    for got, expect in zip(results[: len(want)], want):
        assert got == expect
    for got in results[len(want):]:
        assert got[0] == "parse_error" and "NoSuchFilter" in got[1]
