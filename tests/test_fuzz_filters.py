"""Filter fuzzing: random expression trees evaluated by the device VM must
match the host oracle bit-for-bit (and the batched path must match the
single path)."""

import json
import random

import numpy as np
import pytest


def random_filter(rng: random.Random, db, depth: int = 0) -> dict:
    length = len(db.reference_genomes.nucleotide_ids["main"])
    choices = ["leaf"] if depth >= 3 else [
        "leaf", "leaf", "and", "or", "not", "nof", "maybe", "exact"]
    kind = rng.choice(choices)
    if kind == "leaf":
        leaf_kind = rng.choice(["nuc", "hasmut", "true", "false", "string",
                                "int", "date"])
        if leaf_kind == "nuc":
            return {"type": "NucleotideEquals",
                    "position": rng.randint(1, length),
                    "symbol": rng.choice("ACGT-NRYSWKMBDHV")}
        if leaf_kind == "hasmut":
            return {"type": "HasNucleotideMutation",
                    "position": rng.randint(1, length)}
        if leaf_kind == "string":
            return {"type": "StringEquals", "column": "country",
                    "value": rng.choice(["Switzerland", "Germany", "Nowhere"])}
        if leaf_kind == "int":
            return {"type": "IntBetween", "column": "age",
                    "from": rng.randint(0, 50), "to": rng.randint(50, 100)}
        if leaf_kind == "date":
            return {"type": "DateBetween", "column": "date",
                    "from": "2021-03-01", "to": "2021-03-15"}
        return {"type": rng.choice(["True", "False"])}
    if kind in ("and", "or"):
        n = rng.randint(1, 4)
        return {"type": "And" if kind == "and" else "Or",
                "children": [random_filter(rng, db, depth + 1) for _ in range(n)]}
    if kind == "not":
        return {"type": "Not", "child": random_filter(rng, db, depth + 1)}
    if kind in ("maybe", "exact"):
        return {"type": "Maybe" if kind == "maybe" else "Exact",
                "child": random_filter(rng, db, depth + 1)}
    n = rng.randint(2, 5)
    return {"type": "N-Of", "numberOfMatchers": rng.randint(0, n + 1),
            "matchExactly": rng.random() < 0.5,
            "children": [random_filter(rng, db, depth + 1) for _ in range(n)]}


@pytest.fixture(scope="module")
def fuzz_db():
    from lapis_silo_tpu.testing import synthetic_database

    return synthetic_database(n_rows=999, length=333, n_partitions=3, seed=7)


def test_fuzz_device_vs_host(fuzz_db):
    from lapis_silo_tpu.ops.device_engine import (
        DeviceEngine,
        ProgramTooLarge,
        StructureMismatch,
    )
    from lapis_silo_tpu.query import ast
    from lapis_silo_tpu.query.engine import Query
    from lapis_silo_tpu.query.ir import HostEvaluator

    db = fuzz_db
    engine = DeviceEngine(db)
    rng = random.Random(42)
    checked, fallbacks = 0, 0
    filters = []
    counts = []
    for _ in range(60):
        filter_json = random_filter(rng, db)
        query = Query(json.dumps({"filterExpression": filter_json,
                                  "action": {"type": "Aggregated"}}))
        host_words = []
        for partition in db.partitions:
            node = query.filter.compile(db, partition, ast.NONE)
            host_words.append(HostEvaluator(partition.sequence_count).evaluate(node))
        try:
            device_words = engine.evaluate(query.filter)
        except (ProgramTooLarge, StructureMismatch):
            fallbacks += 1
            continue
        for a, b in zip(host_words, device_words):
            np.testing.assert_array_equal(a, b, err_msg=json.dumps(filter_json))
        filters.append(query.filter)
        counts.append(sum(int(np.bitwise_count(w).sum()) for w in host_words))
        checked += 1
    assert checked >= 40, (checked, fallbacks)
    # batched counts must agree with per-query host counts
    batched = []
    for i in range(0, len(filters), 16):
        batched.extend(engine.count_batch(filters[i : i + 16]))
    assert batched == counts


def test_fuzz_sparse_tier_vs_host(fuzz_db):
    """Same fuzz, but with the two-tier bank forced on (sparse leaves take
    the PUSH_SPARSE densify path)."""
    from lapis_silo_tpu.ops.device_engine import (
        DeviceEngine,
        ProgramTooLarge,
        StructureMismatch,
    )
    from lapis_silo_tpu.query import ast
    from lapis_silo_tpu.query.engine import Query
    from lapis_silo_tpu.query.ir import HostEvaluator

    from lapis_silo_tpu.testing import synthetic_database

    # word-sparse rows need many sequences relative to mutations
    db = synthetic_database(n_rows=16384, length=512, n_partitions=2,
                            mutations_per_genome=2, seed=11)
    engine = DeviceEngine(db, sparse_min_words=1)
    assert engine.n_sparse > 0
    rng = random.Random(43)
    checked, fallbacks = 0, 0
    filters, counts = [], []
    for _ in range(40):
        filter_json = random_filter(rng, db)
        query = Query(json.dumps({"filterExpression": filter_json,
                                  "action": {"type": "Aggregated"}}))
        host_words = []
        for partition in db.partitions:
            node = query.filter.compile(db, partition, ast.NONE)
            host_words.append(HostEvaluator(partition.sequence_count).evaluate(node))
        try:
            device_words = engine.evaluate(query.filter)
        except (ProgramTooLarge, StructureMismatch):
            fallbacks += 1
            continue
        for a, b in zip(host_words, device_words):
            np.testing.assert_array_equal(a, b, err_msg=json.dumps(filter_json))
        filters.append(query.filter)
        counts.append(sum(int(np.bitwise_count(w).sum()) for w in host_words))
        checked += 1
    assert checked >= 25, (checked, fallbacks)
    batched = []
    for i in range(0, len(filters), 16):
        batched.extend(engine.count_batch(filters[i : i + 16]))
    assert batched == counts
