"""Filter fuzzing: random expression trees evaluated by the device VM must
match the host oracle bit-for-bit (and the batched path must match the
single path).

The generator reaches ALL 21 query-expression types (query/ast.py
_EXPRESSION_TYPES) on a rich synthetic corpus (AA segment, pango, float,
insertion columns); `force_leaf` lets the cross-product suite
(test_fuzz_cross_product.py) guarantee every expression appears under
every action at least once per run.
"""

import json
import random

import numpy as np
import pytest

LEAF_KINDS = [
    "true", "false", "nuc", "hasmut", "aa", "hasaamut", "string", "int",
    "inteq", "date", "pango", "floatbetween", "floateq", "nucins", "aains",
]
COMBINATORS = ["and", "or", "not", "nof", "maybe", "exact"]


def _leaf(rng: random.Random, db, kind: str) -> dict:
    length = len(db.reference_genomes.nucleotide_ids["main"])
    rich = bool(db.partitions and db.partitions[0].aa_sequences)
    aa_length = (len(next(iter(db.reference_genomes.aa_ids.values())))
                 if rich else 8)
    if not rich and kind in ("aa", "hasaamut", "pango", "floatbetween",
                             "floateq", "nucins", "aains"):
        kind = "nuc"  # lean corpora keep the original coverage
    if kind == "nuc":
        return {"type": "NucleotideEquals",
                "position": rng.randint(1, length),
                "symbol": rng.choice("ACGT-NRYSWKMBDHV")}
    if kind == "hasmut":
        return {"type": "HasNucleotideMutation",
                "position": rng.randint(1, length)}
    if kind == "aa":
        return {"type": "AminoAcidEquals", "sequenceName": "geneE",
                "position": rng.randint(1, aa_length),
                "symbol": rng.choice("ACDEFGHIKLMNPQRSTVWYX*-")}
    if kind == "hasaamut":
        return {"type": "HasAminoAcidMutation", "sequenceName": "geneE",
                "position": rng.randint(1, aa_length)}
    if kind == "string":
        return {"type": "StringEquals", "column": "country",
                "value": rng.choice(["Switzerland", "Germany", "Nowhere"])}
    if kind == "int":
        return {"type": "IntBetween", "column": "age",
                "from": rng.randint(0, 50), "to": rng.randint(50, 100)}
    if kind == "inteq":
        return {"type": "IntEquals", "column": "age",
                "value": rng.randint(1, 99)}
    if kind == "date":
        return {"type": "DateBetween", "column": "date",
                "from": "2021-03-01", "to": "2021-03-15"}
    if kind == "pango":
        return {"type": "PangoLineage", "column": "pango_lineage",
                "value": rng.choice(["A", "B.1", "B.1.1", "B.1.1.7",
                                     "AY.4", "C.9999"]),
                "includeSublineages": rng.random() < 0.5}
    if kind == "floatbetween":
        lo = round(rng.uniform(0, 60), 2)
        return {"type": "FloatBetween", "column": "qc_value",
                "from": lo, "to": round(lo + rng.uniform(0, 50), 2)}
    if kind == "floateq":
        return {"type": "FloatEquals", "column": "qc_value",
                "value": rng.choice([None, round(rng.uniform(0, 100), 2)])}
    if kind == "nucins":
        return {"type": "InsertionContains",
                "position": rng.randint(1, length),
                "value": rng.choice(["A.*", ".*C", "ACG", "A.*T", ".*"]),
                "column": "nucleotideInsertions"}
    if kind == "aains":
        return {"type": "AminoAcidInsertionContains", "sequenceName": "geneE",
                "position": rng.randint(1, aa_length),
                "value": rng.choice(["A.*", ".*K", "AKL", ".*"]),
                "column": "aminoAcidInsertions"}
    return {"type": "True" if kind == "true" else "False"}


def random_filter(rng: random.Random, db, depth: int = 0,
                  force_leaf: str | None = None,
                  seen: set | None = None) -> dict:
    if force_leaf is not None and (depth >= 3 or rng.random() < 0.4):
        node = _leaf(rng, db, force_leaf)
        if seen is not None:
            seen.add(node["type"])
        return node
    kind = (rng.choice(["leaf", "leaf"] + COMBINATORS) if depth < 3
            else "leaf")
    if kind == "leaf" and force_leaf is None:
        node = _leaf(rng, db, rng.choice(LEAF_KINDS))
        if seen is not None:
            seen.add(node["type"])
        return node
    if kind == "leaf":  # force_leaf still pending: keep descending
        kind = rng.choice(COMBINATORS)
    if seen is not None:
        seen.add({"and": "And", "or": "Or", "not": "Not", "nof": "N-Of",
                  "maybe": "Maybe", "exact": "Exact"}[kind])
    if kind in ("and", "or"):
        n = rng.randint(1, 4)
        forced = rng.randrange(n)
        return {"type": "And" if kind == "and" else "Or",
                "children": [random_filter(rng, db, depth + 1,
                                           force_leaf if i == forced else None,
                                           seen)
                             for i in range(n)]}
    if kind == "not":
        return {"type": "Not",
                "child": random_filter(rng, db, depth + 1, force_leaf, seen)}
    if kind in ("maybe", "exact"):
        return {"type": "Maybe" if kind == "maybe" else "Exact",
                "child": random_filter(rng, db, depth + 1, force_leaf, seen)}
    n = rng.randint(2, 5)
    forced = rng.randrange(n)
    return {"type": "N-Of", "numberOfMatchers": rng.randint(0, n + 1),
            "matchExactly": rng.random() < 0.5,
            "children": [random_filter(rng, db, depth + 1,
                                       force_leaf if i == forced else None,
                                       seen)
                         for i in range(n)]}


ALL_EXPRESSION_TYPES = {
    "True", "False", "And", "Or", "N-Of", "Not", "Maybe", "Exact",
    "DateBetween", "NucleotideEquals", "HasNucleotideMutation",
    "AminoAcidEquals", "HasAminoAcidMutation", "PangoLineage",
    "StringEquals", "IntEquals", "IntBetween", "FloatEquals",
    "FloatBetween", "InsertionContains", "AminoAcidInsertionContains",
}


@pytest.fixture(scope="module")
def fuzz_db():
    from lapis_silo_tpu.testing import synthetic_database

    return synthetic_database(n_rows=999, length=333, n_partitions=3, seed=7,
                              rich=True)


def _run_device_vs_host(db, engine, rng, n_trees, min_checked):
    from lapis_silo_tpu.ops.device_engine import (
        ProgramTooLarge,
        StructureMismatch,
    )
    from lapis_silo_tpu.query import ast
    from lapis_silo_tpu.query.engine import Query
    from lapis_silo_tpu.query.ir import HostEvaluator

    checked, fallbacks = 0, 0
    filters, counts = [], []
    seen: set = set()
    for _ in range(n_trees):
        filter_json = random_filter(rng, db, seen=seen)
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
    assert checked >= min_checked, (checked, fallbacks)
    # batched counts must agree with per-query host counts
    batched = []
    for i in range(0, len(filters), 16):
        batched.extend(engine.count_batch(filters[i : i + 16]))
    assert batched == counts
    return seen


def test_fuzz_device_vs_host(fuzz_db):
    from lapis_silo_tpu.ops.device_engine import DeviceEngine

    engine = DeviceEngine(fuzz_db)
    seen = _run_device_vs_host(fuzz_db, engine, random.Random(42), 200, 150)
    missing = ALL_EXPRESSION_TYPES - seen
    assert not missing, f"expression types never generated: {missing}"


def test_fuzz_sparse_tier_vs_host():
    """Same fuzz, but with the two-tier bank forced on (sparse leaves take
    the PUSH_SPARSE densify path)."""
    from lapis_silo_tpu.ops.device_engine import DeviceEngine
    from lapis_silo_tpu.testing import synthetic_database

    # word-sparse rows need many sequences relative to mutations
    db = synthetic_database(n_rows=16384, length=512, n_partitions=2,
                            mutations_per_genome=2, seed=11, rich=True)
    engine = DeviceEngine(db, sparse_min_words=1)
    assert engine.n_sparse > 0
    _run_device_vs_host(db, engine, random.Random(43), 60, 40)
