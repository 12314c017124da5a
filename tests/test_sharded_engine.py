"""DeviceEngine with the word axis sharded over 8 virtual CPU devices must
be bit-identical to the single-device engine."""

import json

import jax
import numpy as np
import pytest


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_engine_matches_single_device():
    from lapis_silo_tpu.ops.device_engine import DeviceEngine
    from lapis_silo_tpu.query.engine import Query
    from lapis_silo_tpu.testing import sample_count_queries, synthetic_database

    db = synthetic_database(n_rows=2048, length=256, n_partitions=3)
    single = DeviceEngine(db, devices=jax.devices()[:1])
    sharded = DeviceEngine(db, devices=jax.devices()[:8])
    assert sharded.mesh is not None
    queries = [Query(q) for q in sample_count_queries(db, 16)]
    for query in queries:
        assert single.count(query.filter) == sharded.count(query.filter)
    batch = [q.filter for q in queries]
    assert single.count_batch(batch) == sharded.count_batch(batch)
    # mutation histogram across the mesh
    filt = Query(json.dumps({"action": {"type": "Aggregated"},
                             "filterExpression": {"type": "True"}})).filter
    words_single = single.evaluate(filt)
    words_sharded = sharded.evaluate(filt)
    for a, b in zip(words_single, words_sharded):
        np.testing.assert_array_equal(a, b)
    m1 = single.mutation_counts("nuc", "main", words_single)
    m2 = sharded.mutation_counts("nuc", "main", words_sharded)
    np.testing.assert_array_equal(m1, m2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_engine_sparse_tier_matches_single_device():
    """Two-tier bank over the mesh: the sparse CSR stream + densify path
    must stay bit-identical when the word axis is sharded."""
    from lapis_silo_tpu.ops.device_engine import DeviceEngine
    from lapis_silo_tpu.query.engine import Query
    from lapis_silo_tpu.testing import sample_count_queries, synthetic_database

    db = synthetic_database(n_rows=2048, length=256, n_partitions=3,
                            mutations_per_genome=2)
    single = DeviceEngine(db, devices=jax.devices()[:1], sparse_min_words=1)
    sharded = DeviceEngine(db, devices=jax.devices()[:8], sparse_min_words=1)
    assert sharded.mesh is not None and sharded.n_sparse > 0
    queries = [Query(q) for q in sample_count_queries(db, 12)]
    batch = [q.filter for q in queries]
    assert single.count_batch(batch) == sharded.count_batch(batch)
    filt = Query(json.dumps({"action": {"type": "Aggregated"},
                             "filterExpression": {"type": "True"}})).filter
    m1 = single.mutation_counts("nuc", "main", single.evaluate(filt))
    m2 = sharded.mutation_counts("nuc", "main", sharded.evaluate(filt))
    np.testing.assert_array_equal(m1, m2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_pool_and_sparse_mutations_kernel(monkeypatch):
    """Round-5 mesh scale tier: the hot-leaf pool (word-sharded like the
    bank, window-local sharded updates, pool-resident VM reads) and the
    sharded sparse-Mutations reduction (entry-split Mosaic gather kernel +
    psum) must run on the 8-device mesh — spy-asserted — and stay
    bit-exact vs the single-device engine."""
    monkeypatch.setenv("SILO_FORCE_BANK3", "1")
    monkeypatch.setenv("SILO_PALLAS_INTERPRET", "1")
    from lapis_silo_tpu.ops import device_engine as de
    from lapis_silo_tpu.ops import pallas_kernels as pk
    from lapis_silo_tpu.ops import reductions
    from lapis_silo_tpu.query.engine import Query
    from lapis_silo_tpu.testing import sample_count_queries, synthetic_database

    calls = {"pool_update_mesh": 0, "sparse_gather_kernel": 0}
    real_pool_jit = de._pool_update_jit

    def spy_pool_jit(k_bucket, n_partitions, n_words, mesh=None,
                     e_budget=0):
        if mesh is not None:
            calls["pool_update_mesh"] += 1
        return real_pool_jit(k_bucket, n_partitions, n_words, mesh,
                             e_budget)

    real_gather = pk.sparse_filter_popcount

    def spy_gather(*args, **kwargs):
        calls["sparse_gather_kernel"] += 1
        return real_gather(*args, **kwargs)

    monkeypatch.setattr(de, "_pool_update_jit", spy_pool_jit)
    monkeypatch.setattr(pk, "sparse_filter_popcount", spy_gather)
    de._interpreter.cache_clear()
    reductions._sparse_mutation_counts_sharded_jit.cache_clear()
    try:
        db = synthetic_database(n_rows=2048, length=256, n_partitions=3,
                                mutations_per_genome=2)
        single = de.DeviceEngine(db, devices=jax.devices()[:1],
                                 sparse_min_words=1)
        sharded = de.DeviceEngine(db, devices=jax.devices()[:8],
                                  sparse_min_words=1)
        assert sharded.mesh is not None and sharded.n_sparse > 0
        assert sharded.pool_slots > 0, "mesh pool must be active"
        queries = [Query(q) for q in sample_count_queries(db, 12)]
        batch = [q.filter for q in queries]
        want = single.count_batch(batch)
        assert sharded.count_batch(batch) == want
        assert calls["pool_update_mesh"] > 0, \
            "sharded pool update never dispatched"
        misses_after_cold = sharded.pool_misses
        # repeat: the same leaves must now be pool hits, not re-densified
        assert sharded.count_batch(batch) == want
        assert sharded.pool_hits > 0, "no pool-resident reads"
        assert sharded.pool_misses == misses_after_cold, \
            "hot leaves re-densified"
        # sharded sparse-Mutations through the Mosaic gather kernel
        filt = Query(json.dumps({
            "action": {"type": "Aggregated"},
            "filterExpression": {"type": "HasNucleotideMutation",
                                 "position": 7}})).filter
        m1 = single.mutation_counts("nuc", "main", single.evaluate(filt))
        m2 = sharded.mutation_counts("nuc", "main", sharded.evaluate(filt))
        np.testing.assert_array_equal(m1, m2)
        assert calls["sparse_gather_kernel"] > 0, \
            "sharded sparse-Mutations kernel never reached"
    finally:
        de._interpreter.cache_clear()
        reductions._sparse_mutation_counts_sharded_jit.cache_clear()
        de.vm._pool_update_jit.cache_clear()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_engine_kernel_path_matches_xla(monkeypatch):
    """The mesh engine with the Mosaic kernel paths FORCED (bank3 +
    interpret-mode pallas under shard_map — the configuration a real
    multi-chip TPU runs) must stay bit-identical to the plain XLA mesh
    engine and the single-device engine."""
    monkeypatch.setenv("SILO_FORCE_BANK3", "1")
    monkeypatch.setenv("SILO_PALLAS_INTERPRET", "1")
    from lapis_silo_tpu.ops.device_engine import DeviceEngine
    from lapis_silo_tpu.query.engine import Query
    from lapis_silo_tpu.testing import sample_count_queries, synthetic_database

    from lapis_silo_tpu.ops import pallas_kernels as pk

    calls = {"sharded": 0}
    real = pk.vm_run_sharded

    def spy(*args, **kwargs):
        calls["sharded"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(pk, "vm_run_sharded", spy)
    # a fresh interpreter cache: cached closures may hold the un-spied fn
    # and gates evaluated under different env values
    from lapis_silo_tpu.ops import device_engine as de
    de._interpreter.cache_clear()

    db = synthetic_database(n_rows=2048, length=256, n_partitions=3)
    kernel = DeviceEngine(db, devices=jax.devices()[:8])
    assert kernel.mesh is not None and kernel.bank3
    assert kernel.bank.ndim == 3
    # reference values from the HOST oracle (env-independent)
    from lapis_silo_tpu.ops import bitset
    from lapis_silo_tpu.query import ast
    from lapis_silo_tpu.query.ir import HostEvaluator

    def oracle_count(filter_expr):
        total = 0
        db.uniform_compile = True
        try:
            for partition in db.partitions:
                node = filter_expr.compile(db, partition, ast.NONE)
                total += int(bitset.popcount(
                    HostEvaluator(partition.sequence_count).evaluate(node)))
        finally:
            db.uniform_compile = False
        return total

    queries = [Query(q) for q in sample_count_queries(db, 12)]
    batch = [q.filter for q in queries]
    got = kernel.count_batch(batch)
    want = [oracle_count(f) for f in batch]
    assert got == want
    assert calls["sharded"] > 0, "vm_run_sharded was never reached"
    de._interpreter.cache_clear()  # drop closures over the spy/env


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_conformance_corpus_through_vm_run_sharded(example_dataset_db,
                                                   monkeypatch):
    """End-to-end conformance sample on the FORCED multi-chip Mosaic path:
    the exampleDataset corpus executed with bank3 + interpret-mode pallas
    under shard_map over the 8-device mesh (the configuration a real pod
    runs) must produce the reference's exact expected responses."""
    import os

    from .test_conformance import QUERIES_DIR, deep_equal

    monkeypatch.setenv("SILO_FORCE_BANK3", "1")
    monkeypatch.setenv("SILO_PALLAS_INTERPRET", "1")
    from lapis_silo_tpu.ops import device_engine as de
    from lapis_silo_tpu.ops import pallas_kernels as pk
    from lapis_silo_tpu.query.engine import QueryEngine

    calls = {"sharded": 0}
    real = pk.vm_run_sharded

    def spy(*args, **kwargs):
        calls["sharded"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(pk, "vm_run_sharded", spy)
    de._interpreter.cache_clear()
    db = example_dataset_db
    saved_engine = db._engine
    saved_device_engine = getattr(db, "device_engine", None)
    try:
        db._engine = None
        engine = QueryEngine(db)
        kernel_engine = de.DeviceEngine(db, devices=jax.devices()[:8])
        assert kernel_engine.mesh is not None and kernel_engine.bank3
        engine._device_engine = kernel_engine
        db.device_engine = kernel_engine
        # a corpus sample spanning every action family (interpret-mode
        # pallas is slow — the full 94 run on the default path already)
        sample = [
            "And.json", "nOf_2of3_aggregated.json", "HasAAMutation.json",
            "nOf_2of3_mutations.json", "sequenceStartEndMutations.json",
            "GroupByLineageOrderByCountLimit.json", "DetailsOrderByLimit.json",
            "fastaAligned.json", "insertionsAction.json", "Maybe.json",
        ]
        ran = 0
        for case_file in sample:
            path = os.path.join(QUERIES_DIR, case_file)
            if not os.path.exists(path):
                continue
            with open(path) as f:
                case = json.load(f)
            response = engine.execute(json.dumps(case["query"]))
            deep_equal({"queryResult": case["expectedQueryResult"]},
                       response, case_file)
            ran += 1
        assert ran >= 8, f"only {ran} corpus cases found"
        assert calls["sharded"] > 0, "vm_run_sharded was never reached"
    finally:
        db._engine = saved_engine
        db.device_engine = saved_device_engine
        de._interpreter.cache_clear()
