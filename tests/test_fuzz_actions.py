"""Action fuzzing: full JSON results from the device-backed engine must
match a host-only oracle engine on random (filter, action) pairs.

The filter fuzzer (test_fuzz_filters) pins device==host at the bitset
level; this suite pins the whole response — Aggregated group-by through
the device segment-sum fast path, Mutations through the device popcount
reduction, Details/FastaAligned materialization — against a second
Database built from the same seed that never touches the device engine
(ref: endToEndTests/test/query.test.js deep-equal discipline, applied to
randomized queries instead of the checked-in corpus).
"""

import json
import random

import pytest

from tests.test_fuzz_filters import random_filter


def _canon(rows: list[dict]) -> list[str]:
    """Order-insensitive canonical form (queries without orderBy leave row
    order unspecified — the reference's map iteration order is an artifact)."""
    return sorted(json.dumps(r, sort_keys=True) for r in rows)


def random_action(rng: random.Random) -> tuple[dict, str]:
    """Returns (action_json, compare_mode) where compare_mode is "exact"
    (orderBy pins a total order) or "multiset"."""
    kind = rng.choice(["agg", "agg_group", "agg_group_ordered", "mutations",
                       "details", "details_ordered", "fasta_aligned"])
    if kind == "agg":
        return {"type": "Aggregated"}, "multiset"
    if kind in ("agg_group", "agg_group_ordered"):
        fields = rng.sample(["country", "age", "date"], rng.randint(1, 3))
        action = {"type": "Aggregated", "groupByFields": fields}
        if kind == "agg_group_ordered":
            # ordering by every group-by field makes the sort key unique,
            # so exact list comparison is well-defined even with offset/limit
            action["orderByFields"] = list(fields)
            if rng.random() < 0.5:
                action["limit"] = rng.randint(1, 8)
            if rng.random() < 0.5:
                action["offset"] = rng.randint(0, 4)
            return action, "exact"
        return action, "multiset"
    if kind == "mutations":
        return {"type": "Mutations",
                "minProportion": rng.choice([0.0, 0.001, 0.05, 0.3, 1.0])}, \
            "multiset"
    if kind in ("details", "details_ordered"):
        fields = rng.sample(["key", "country", "age", "date"], rng.randint(1, 4))
        if "key" not in fields:
            fields.append("key")
        action = {"type": "Details", "fields": fields}
        if kind == "details_ordered":
            action["orderByFields"] = ["key"]  # primary key: unique
            if rng.random() < 0.7:
                action["limit"] = rng.randint(1, 20)
            if rng.random() < 0.5:
                action["offset"] = rng.randint(0, 10)
            return action, "exact"
        return action, "multiset"
    return {"type": "FastaAligned", "sequenceName": ["main"]}, "multiset"


@pytest.fixture(scope="module")
def engines():
    from lapis_silo_tpu.query.engine import QueryEngine
    from lapis_silo_tpu.testing import synthetic_database

    # two independent Database objects from the same seed: the host oracle
    # must never see the device engine (Mutations picks up db.device_engine)
    db_dev = synthetic_database(n_rows=999, length=333, n_partitions=3, seed=7)
    db_host = synthetic_database(n_rows=999, length=333, n_partitions=3, seed=7)
    return (QueryEngine(db_dev, use_device=True),
            QueryEngine(db_host, use_device=False))


def test_fuzz_actions_device_vs_host(engines):
    dev_engine, host_engine = engines
    rng = random.Random(1234)
    checked = 0
    for _ in range(50):
        db = dev_engine.database
        action, mode = random_action(rng)
        query = json.dumps({
            "filterExpression": random_filter(rng, db),
            "action": action,
        })
        dev_rows = dev_engine.execute(query)["queryResult"]
        host_rows = host_engine.execute(query)["queryResult"]
        if mode == "exact":
            assert dev_rows == host_rows, query
        else:
            assert _canon(dev_rows) == _canon(host_rows), query
        checked += 1
    assert checked == 50


def test_fuzz_actions_sparse_tier(engines):
    """Same action fuzz with the two-tier bank forced on: Aggregated and
    Mutations ride the sparse densify / CSR reduction paths."""
    from lapis_silo_tpu.ops.device_engine import DeviceEngine
    from lapis_silo_tpu.query.engine import QueryEngine
    from lapis_silo_tpu.testing import synthetic_database

    db_dev = synthetic_database(n_rows=8192, length=256, n_partitions=2,
                                mutations_per_genome=2, seed=19)
    db_host = synthetic_database(n_rows=8192, length=256, n_partitions=2,
                                 mutations_per_genome=2, seed=19)
    dev_engine = QueryEngine(db_dev, use_device=True)
    dev_engine._device_engine = DeviceEngine(db_dev, sparse_min_words=1)
    db_dev.device_engine = dev_engine._device_engine
    assert dev_engine._device_engine.n_sparse > 0
    host_engine = QueryEngine(db_host, use_device=False)

    rng = random.Random(4321)
    for _ in range(25):
        action, mode = random_action(rng)
        query = json.dumps({
            "filterExpression": random_filter(rng, db_dev),
            "action": action,
        })
        dev_rows = dev_engine.execute(query)["queryResult"]
        host_rows = host_engine.execute(query)["queryResult"]
        if mode == "exact":
            assert dev_rows == host_rows, query
        else:
            assert _canon(dev_rows) == _canon(host_rows), query
