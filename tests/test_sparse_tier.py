"""Two-tier device bank: force the sparse tier (CSR-of-words stream +
PUSH_SPARSE densify-scatter) and check bit-identical results vs the host
oracle and the all-dense engine."""

import json

import numpy as np
import pytest

from .conftest import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference test data not available"
)

FILTERS = [
    {"type": "True"},
    {"type": "NucleotideEquals", "position": 25, "symbol": "T"},
    {"type": "NucleotideEquals", "position": 25, "symbol": "C"},  # majority leaf
    {"type": "HasNucleotideMutation", "position": 241},
    {"type": "And", "children": [
        {"type": "NucleotideEquals", "position": 241, "symbol": "T"},
        {"type": "Not", "child": {"type": "NucleotideEquals", "position": 25, "symbol": "T"}},
    ]},
    {"type": "N-Of", "numberOfMatchers": 2, "matchExactly": True, "children": [
        {"type": "NucleotideEquals", "position": 241, "symbol": "T"},
        {"type": "NucleotideEquals", "position": 3037, "symbol": "T"},
        {"type": "NucleotideEquals", "position": 14408, "symbol": "T"},
    ]},
    {"type": "Maybe", "child": {"type": "NucleotideEquals", "position": 26, "symbol": "A"}},
    {"type": "StringEquals", "column": "country", "value": "Switzerland"},
]


@pytest.fixture(scope="module")
def sparse_engine(example_dataset_db):
    from lapis_silo_tpu.ops.device_engine import DeviceEngine

    engine = DeviceEngine(example_dataset_db, sparse_min_words=1)
    assert engine.n_sparse > 0, "sparse tier not active"
    return engine


@pytest.fixture(scope="module")
def dense_engine(example_dataset_db):
    from lapis_silo_tpu.ops.device_engine import DeviceEngine

    return DeviceEngine(example_dataset_db)


@pytest.mark.parametrize("filter_json", FILTERS,
                         ids=lambda f: json.dumps(f)[:40])
def test_sparse_filter_matches_host(example_dataset_db, sparse_engine, filter_json):
    from lapis_silo_tpu.query import ast
    from lapis_silo_tpu.query.engine import Query
    from lapis_silo_tpu.query.ir import HostEvaluator

    db = example_dataset_db
    query = Query(json.dumps({"filterExpression": filter_json,
                              "action": {"type": "Aggregated"}}))
    device_words = sparse_engine.evaluate(query.filter)
    for partition, words in zip(db.partitions, device_words):
        node = query.filter.compile(db, partition, ast.NONE)
        host_words = HostEvaluator(partition.sequence_count).evaluate(node)
        np.testing.assert_array_equal(words, host_words, err_msg=str(filter_json))


def test_sparse_count_batch(example_dataset_db, sparse_engine, dense_engine):
    from lapis_silo_tpu.query.engine import Query

    queries = [Query(json.dumps({"filterExpression": f,
                                 "action": {"type": "Aggregated"}})).filter
               for f in FILTERS]
    got = sparse_engine.count_batch(queries)
    expected = [dense_engine.count(q) for q in queries]
    assert got == expected


def test_sparse_mutation_counts(example_dataset_db, sparse_engine, dense_engine):
    from lapis_silo_tpu.query.engine import Query

    query = Query(json.dumps({
        "filterExpression": {"type": "StringEquals", "column": "country",
                             "value": "Switzerland"},
        "action": {"type": "Aggregated"}}))
    filter_words = dense_engine.evaluate(query.filter)
    for kind, name in sparse_engine.segment_meta:
        got = sparse_engine.mutation_counts(kind, name, filter_words)
        expected = dense_engine.mutation_counts(kind, name, filter_words)
        np.testing.assert_array_equal(got, expected, err_msg=f"{kind}:{name}")


def test_sparse_tier_memory_is_smaller(sparse_engine, dense_engine):
    # the whole point: the sparse engine's dense bank holds far fewer rows
    assert sparse_engine.n_rows < dense_engine.n_rows / 2


def test_sparse_gate_uses_total_row_footprint():
    """The tier activates on partitions x words (a bank row's total bytes),
    so a 16-partition corpus is judged like the single-partition corpus of
    the same size (device_engine.py sparse_min_words / SPARSE_BANK_BUDGET_GB)."""
    from lapis_silo_tpu.ops.device_engine import DeviceEngine
    from lapis_silo_tpu.testing import synthetic_database

    db = synthetic_database(n_rows=512, length=64, n_partitions=4)
    probe = DeviceEngine(db, sparse_min_words=1)
    footprint = probe.n_partitions * probe.n_words  # incl. device padding
    assert footprint > probe.n_words  # multi-partition: product > per-part W
    assert DeviceEngine(db, sparse_min_words=footprint).sparse_enabled
    assert not DeviceEngine(db, sparse_min_words=footprint + 1).sparse_enabled


def test_sparse_kernel_path_matches_dense(example_dataset_db, dense_engine,
                                          monkeypatch):
    """The FULL kernel configuration a real TPU runs for sparse corpora —
    Mosaic densify (densify_rows) feeding the Mosaic VM (vm_run), both in
    interpret mode — must be bit-identical to the plain dense engine. A
    call spy proves the densify kernel actually ran."""
    from lapis_silo_tpu.ops import device_engine as de
    from lapis_silo_tpu.ops import pallas_kernels as pk
    from lapis_silo_tpu.query.engine import Query

    if not pk.HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    monkeypatch.setenv("SILO_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("SILO_FORCE_BANK3", "1")
    calls = {"densify": 0}
    real = pk.densify_rows

    def spy(*args, **kwargs):
        calls["densify"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(pk, "densify_rows", spy)
    import jax

    de._interpreter.cache_clear()
    engine = de.DeviceEngine(example_dataset_db, sparse_min_words=1,
                             devices=jax.devices()[:1])
    assert engine.n_sparse > 0 and engine.bank3 and engine.mesh is None

    queries = [Query(json.dumps({"filterExpression": f,
                                 "action": {"type": "Aggregated"}}))
               for f in FILTERS]
    batch = [q.filter for q in queries]
    got = engine.count_batch(batch)
    want = dense_engine.count_batch(batch)
    assert got == want
    assert calls["densify"] > 0, "densify kernel was never reached"
    de._interpreter.cache_clear()  # drop closures over the spy/env
