"""Action fuzzing: full JSON results from the device-backed engine must
match a host-only oracle engine on random (filter, action) pairs.

The filter fuzzer (test_fuzz_filters) pins device==host at the bitset
level; this suite pins the whole response — Aggregated group-by through
the device segment-sum fast path, Mutations (nuc + AA) through the device
popcount reduction, Details/FastaAligned materialization, Insertions —
against a second Database built from the same seed that never touches the
device engine (ref: endToEndTests/test/query.test.js deep-equal
discipline, applied to randomized queries instead of the checked-in
corpus). `Fasta` needs an unaligned store the synthetic corpus doesn't
build — it stays pinned by the conformance corpus + test_native_http.
"""

import json
import random

import pytest

from tests.test_fuzz_filters import random_filter

GROUP_FIELDS = ["country", "age", "date", "pango_lineage", "qc_value"]
DETAIL_FIELDS = ["key", "country", "age", "date", "pango_lineage", "qc_value",
                 "nucleotideInsertions", "aminoAcidInsertions"]

ACTION_KINDS = ["agg", "agg_group", "agg_group_ordered", "mutations",
                "aa_mutations", "details", "details_ordered", "insertions",
                "aa_insertions", "fasta_aligned"]


def _canon(rows: list[dict]) -> list[str]:
    """Order-insensitive canonical form (queries without orderBy leave row
    order unspecified — the reference's map iteration order is an artifact)."""
    return sorted(json.dumps(r, sort_keys=True) for r in rows)


def _order_by(rng: random.Random, fields: list[str]):
    """Mix plain-string and {field, order} descending forms."""
    out = []
    for f in fields:
        if rng.random() < 0.4:
            out.append({"field": f,
                        "order": rng.choice(["ascending", "descending"])})
        else:
            out.append(f)
    return out


def random_action(rng: random.Random, kind: str | None = None) -> tuple[dict, str]:
    """Returns (action_json, compare_mode) where compare_mode is "exact"
    (orderBy pins a total order) or "multiset"."""
    kind = kind or rng.choice(ACTION_KINDS)
    if kind == "agg":
        return {"type": "Aggregated"}, "multiset"
    if kind in ("agg_group", "agg_group_ordered"):
        fields = rng.sample(GROUP_FIELDS, rng.randint(1, 3))
        action = {"type": "Aggregated", "groupByFields": fields}
        if kind == "agg_group_ordered":
            # ordering by every group-by field makes the sort key unique,
            # so exact list comparison is well-defined even with offset/limit
            action["orderByFields"] = _order_by(rng, list(fields))
            if rng.random() < 0.5:
                action["limit"] = rng.randint(1, 8)
            if rng.random() < 0.5:
                action["offset"] = rng.randint(0, 4)
            return action, "exact"
        return action, "multiset"
    if kind in ("mutations", "aa_mutations"):
        action = {"type": "Mutations" if kind == "mutations"
                  else "AminoAcidMutations",
                  "minProportion": rng.choice([0.0, 0.001, 0.05, 0.3, 1.0])}
        if rng.random() < 0.4:
            action["orderByFields"] = _order_by(
                rng, ["mutation"])  # unique key -> exact
            if rng.random() < 0.5:
                action["limit"] = rng.randint(1, 30)
            if rng.random() < 0.3:
                action["offset"] = rng.randint(0, 10)
            return action, "exact"
        return action, "multiset"
    if kind in ("details", "details_ordered"):
        fields = rng.sample(DETAIL_FIELDS, rng.randint(1, 5))
        if "key" not in fields:
            fields.append("key")
        action = {"type": "Details", "fields": fields}
        if kind == "details_ordered":
            action["orderByFields"] = _order_by(rng, ["key"])  # unique
            if rng.random() < 0.7:
                action["limit"] = rng.randint(1, 20)
            if rng.random() < 0.5:
                action["offset"] = rng.randint(0, 10)
            return action, "exact"
        return action, "multiset"
    if kind in ("insertions", "aa_insertions"):
        action = {"type": "Insertions" if kind == "insertions"
                  else "AminoAcidInsertions"}
        if rng.random() < 0.4:
            # (position, sequenceName, insertions) triple is unique per row
            action["orderByFields"] = _order_by(
                rng, ["position", "insertions", "count"])
            if rng.random() < 0.5:
                action["limit"] = rng.randint(1, 15)
            return action, "exact"
        return action, "multiset"
    name = random.Random(rng.random()).choice([["main"], ["geneE"],
                                               ["main", "geneE"]])
    return {"type": "FastaAligned", "sequenceName": name}, "multiset"


@pytest.fixture(scope="module")
def engines():
    from lapis_silo_tpu.query.engine import QueryEngine
    from lapis_silo_tpu.testing import synthetic_database

    # two independent Database objects from the same seed: the host oracle
    # must never see the device engine (Mutations picks up db.device_engine)
    db_dev = synthetic_database(n_rows=999, length=333, n_partitions=3,
                                seed=7, rich=True)
    db_host = synthetic_database(n_rows=999, length=333, n_partitions=3,
                                 seed=7, rich=True)
    return (QueryEngine(db_dev, use_device=True),
            QueryEngine(db_host, use_device=False))


def _check_one(dev_engine, host_engine, query, mode):
    dev_rows = dev_engine.execute(query)["queryResult"]
    host_rows = host_engine.execute(query)["queryResult"]
    if mode == "exact":
        assert dev_rows == host_rows, query
    else:
        assert _canon(dev_rows) == _canon(host_rows), query


def test_fuzz_actions_device_vs_host(engines):
    dev_engine, host_engine = engines
    rng = random.Random(1234)
    kinds_seen = set()
    for i in range(120):
        kind = ACTION_KINDS[i % len(ACTION_KINDS)]  # every kind, many times
        action, mode = random_action(rng, kind)
        kinds_seen.add(action["type"])
        query = json.dumps({
            "filterExpression": random_filter(rng, dev_engine.database),
            "action": action,
        })
        _check_one(dev_engine, host_engine, query, mode)
    assert kinds_seen == {"Aggregated", "Mutations", "AminoAcidMutations",
                          "Details", "Insertions", "AminoAcidInsertions",
                          "FastaAligned"}


def test_fuzz_actions_sparse_tier(engines):
    """Same action fuzz with the two-tier bank forced on: Aggregated and
    Mutations ride the sparse densify / CSR reduction paths."""
    from lapis_silo_tpu.ops.device_engine import DeviceEngine
    from lapis_silo_tpu.query.engine import QueryEngine
    from lapis_silo_tpu.testing import synthetic_database

    db_dev = synthetic_database(n_rows=8192, length=256, n_partitions=2,
                                mutations_per_genome=2, seed=19, rich=True)
    db_host = synthetic_database(n_rows=8192, length=256, n_partitions=2,
                                 mutations_per_genome=2, seed=19, rich=True)
    dev_engine = QueryEngine(db_dev, use_device=True)
    dev_engine._device_engine = DeviceEngine(db_dev, sparse_min_words=1)
    db_dev.device_engine = dev_engine._device_engine
    assert dev_engine._device_engine.n_sparse > 0
    host_engine = QueryEngine(db_host, use_device=False)

    rng = random.Random(4321)
    for i in range(40):
        action, mode = random_action(rng, ACTION_KINDS[i % len(ACTION_KINDS)])
        query = json.dumps({
            "filterExpression": random_filter(rng, db_dev),
            "action": action,
        })
        _check_one(dev_engine, host_engine, query, mode)
