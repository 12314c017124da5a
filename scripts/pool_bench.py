"""Hot-leaf-pool benchmark at the sparse-tier flagship shape (default
10M x 29903 x 32 partitions) — the round-1 sparse scaling cliff
(BENCHMARKS.md "10M x 32 with the Mosaic densify kernel": 3,082 qps,
densify-bound).

Two workloads, both with DISTINCT query programs per measured batch (the
relay memoizes identical executions):
  hot : fresh random boolean combinations over a bounded working set of
        (symbol, position) leaves that fits the pool — the serving norm
        (dashboards repeat the same mutations). Warm batches run ZERO
        densify work: one VM dispatch per 512 queries.
  cold: sample_count_queries over the whole corpus with a fresh seed per
        batch — every leaf misses; measures the pool's worst case
        (update dispatches + VM) against the fused-densify baseline.

Counts are verified bit-identical against the HOST oracle for one batch
before timing.

Env: SILO_BENCH_ROWS (10485760), SILO_BENCH_LENGTH (29903),
SILO_BENCH_PARTITIONS (32), SILO_BENCH_QUERIES (512), SILO_BENCH_HOT_LEAVES
(1536), SILO_BENCH_BATCHES (3), SILO_LEAF_POOL_GB (3.0),
SILO_BENCH_CPU (0).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def hot_queries(db, positions, n_queries, seed):
    """Shared helper (lapis_silo_tpu.testing.hot_count_queries): fresh
    random boolean combinations over a FIXED (position, symbol) working
    set — distinct programs per batch, bounded leaf universe."""
    from lapis_silo_tpu.testing import hot_count_queries

    return hot_count_queries(db, positions, n_queries, seed)


def main():
    if os.environ.get("SILO_BENCH_CPU", "0") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
        os.environ.setdefault("SILO_PALLAS_INTERPRET", "1")
        os.environ.setdefault("SILO_FORCE_BANK3", "1")
    n_rows = int(os.environ.get("SILO_BENCH_ROWS", 10_485_760))
    length = int(os.environ.get("SILO_BENCH_LENGTH", 29903))
    n_partitions = int(os.environ.get("SILO_BENCH_PARTITIONS", 32))
    n_queries = int(os.environ.get("SILO_BENCH_QUERIES", 512))
    n_hot = int(os.environ.get("SILO_BENCH_HOT_LEAVES", 1536))
    n_batches = int(os.environ.get("SILO_BENCH_BATCHES", 3))

    import jax

    from lapis_silo_tpu.ops import device_engine as de
    from lapis_silo_tpu.query import ast
    from lapis_silo_tpu.query.engine import Query
    from lapis_silo_tpu.query.ir import HostEvaluator
    from lapis_silo_tpu.testing import sample_count_queries, synthetic_database

    t0 = time.time()
    cache_dir = os.environ.get("SILO_BENCH_SNAPSHOT_CACHE")
    db = None
    if cache_dir:
        from lapis_silo_tpu.storage.snapshot import (
            find_newest_snapshot, load_database, save_database,
        )

        tag = os.path.join(cache_dir, f"{n_rows}_{length}_{n_partitions}")
        newest = find_newest_snapshot(tag) if os.path.isdir(tag) else None
        if newest:
            db = load_database(newest)
            log(f"corpus loaded from snapshot cache {time.time() - t0:.0f}s")
    if db is None:
        db = synthetic_database(n_rows=n_rows, length=length,
                                n_partitions=n_partitions)
        log(f"corpus {time.time() - t0:.0f}s")
        if cache_dir:
            t0 = time.time()
            save_database(db, tag)
            log(f"corpus cached {time.time() - t0:.0f}s")
    t0 = time.time()
    # smoke runs force the sparse tier (small corpora are dense by gate)
    sparse_min_words = (1 if os.environ.get("SILO_BENCH_FORCE_SPARSE") == "1"
                        else None)
    engine = de.DeviceEngine(db, sparse_min_words=sparse_min_words)
    jax.block_until_ready(engine.bank)
    log(f"engine up {time.time() - t0:.0f}s: sparse rows={engine.n_sparse} "
        f"pool slots={engine.pool_slots} "
        f"stream={sum(a.nbytes for a in engine.sparse_stream) / 1e6:.0f} MB"
        if engine.sparse_stream else "engine up (dense)")
    assert engine.pool_slots > 0, "pool inactive — nothing to measure"

    # hot working set: n_hot/4 positions — each contributes up to ~4
    # leaves (an equals row, plus HasNucleotideMutation's non-ref symbol
    # rows), and the universe MUST fit the pool or the LRU churns
    # evictions at steady state (measured: 165 ms/batch in-pool vs
    # 700-800 ms thrashing when the universe ran ~20% over the slots)
    rng = np.random.default_rng(7)
    positions = rng.choice(length, size=max(8, n_hot // 4), replace=False)

    def lower_batch(queries):
        return [engine.lower(Query(q).filter)[0] for q in queries]

    # --- bit-exactness: one hot batch vs the host oracle -----------------
    check_queries = hot_queries(db, positions, 64, seed=999)
    check_programs = lower_batch(check_queries)
    got = engine.count_programs(check_programs,
                                min_bucket=de._BATCH_LEN_BUCKETS[-1])
    want = []
    for q in check_queries:
        query = Query(q)
        total = 0
        for partition in db.partitions:
            node = query.filter.compile(db, partition, ast.NONE)
            words = HostEvaluator(partition.sequence_count).evaluate(node)
            total += int(np.bitwise_count(words).sum())
        want.append(total)
    assert got == want, "device counts diverge from host oracle"
    log(f"bit-exactness: 64/64 hot-batch counts match the host oracle")

    results = {}
    # --- hot workload ----------------------------------------------------
    warm = lower_batch(hot_queries(db, positions, n_queries, seed=0))
    t0 = time.time()
    engine.count_programs(warm, min_bucket=de._BATCH_LEN_BUCKETS[-1])
    log(f"hot warm-up {time.time() - t0:.0f}s "
        f"(pool resident={len(engine._leaf_slot)})")
    times = []
    for i in range(n_batches):
        progs = lower_batch(hot_queries(db, positions, n_queries, seed=i + 1))
        m0, u0 = engine.pool_misses, engine.pool_update_dispatches
        t0 = time.perf_counter()
        engine.count_programs(progs, min_bucket=de._BATCH_LEN_BUCKETS[-1])
        times.append(time.perf_counter() - t0)
        log(f"hot batch {i}: {times[-1] * 1e3:.1f} ms "
            f"({n_queries / times[-1]:.0f} qps) "
            f"misses={engine.pool_misses - m0} "
            f"updates={engine.pool_update_dispatches - u0} "
            f"resident={len(engine._leaf_slot)}")
    best = min(times)
    results["hot_qps"] = round(n_queries / best, 1)
    results["hot_ms_per_batch"] = round(best * 1e3, 1)

    # --- hot, pipelined: the serving drainer's behavior — consecutive
    # batches' dispatches issue back-to-back, readbacks overlap, so the
    # dispatch/readback RTTs amortize across the pipeline (bench.py
    # measures the dense flagship the same way) -------------------------
    batches = [lower_batch(hot_queries(db, positions, n_queries,
                                       seed=50 + i))
               for i in range(n_batches)]
    for progs in batches[:1]:  # residency + executable warm (untimed)
        engine.count_programs(progs, min_bucket=de._BATCH_LEN_BUCKETS[-1])
    t0 = time.perf_counter()
    in_flight = []
    for progs in batches:
        min_k, min_e = engine.sparse_floors(progs)
        in_flight.extend(engine.count_dispatches(
            progs, de._BATCH_LEN_BUCKETS[-1], min_k, min_e))
    for arr, _n in in_flight:
        try:
            arr.copy_to_host_async()
        except Exception:  # noqa: BLE001
            pass
    counts = [int(c) for arr, nq in in_flight
              for c in np.asarray(arr)[:nq]]
    total = time.perf_counter() - t0
    assert len(counts) == n_batches * n_queries
    results["hot_pipelined_qps"] = round(n_batches * n_queries / total, 1)
    results["hot_pipelined_ms_per_batch"] = round(
        total / n_batches * 1e3, 1)
    log(f"hot pipelined: {n_batches} batches in {total * 1e3:.1f} ms "
        f"({results['hot_pipelined_qps']} qps)")

    # --- cold workload ---------------------------------------------------
    times = []
    for i in range(n_batches):
        queries = sample_count_queries(db, n_queries=n_queries, seed=100 + i)
        progs = lower_batch(queries)
        m0, u0 = engine.pool_misses, engine.pool_update_dispatches
        t0 = time.perf_counter()
        engine.count_programs(progs, min_bucket=de._BATCH_LEN_BUCKETS[-1])
        times.append(time.perf_counter() - t0)
        log(f"cold batch {i}: {times[-1] * 1e3:.1f} ms "
            f"({n_queries / times[-1]:.0f} qps) "
            f"misses={engine.pool_misses - m0} "
            f"updates={engine.pool_update_dispatches - u0}")
    best = min(times)
    results["cold_qps"] = round(n_queries / best, 1)
    results["cold_ms_per_batch"] = round(best * 1e3, 1)

    # --- cold, pipelined: the serving drainer's behavior under a cold
    # sweep — consecutive batches' update+VM dispatches issue back to
    # back, readbacks overlap (the sync form above exposes every
    # readback RTT serially) ------------------------------------------
    cold_batches = [lower_batch(sample_count_queries(
        db, n_queries=n_queries, seed=200 + i)) for i in range(n_batches)]
    m0, u0 = engine.pool_misses, engine.pool_update_dispatches
    t0 = time.perf_counter()
    in_flight = []
    for progs in cold_batches:
        in_flight.extend(engine.count_dispatches(
            progs, de._BATCH_LEN_BUCKETS[-1]))
    for arr, _n in in_flight:
        try:
            arr.copy_to_host_async()
        except Exception:  # noqa: BLE001
            pass
    counts = [int(c) for arr, nq in in_flight for c in np.asarray(arr)[:nq]]
    total = time.perf_counter() - t0
    assert len(counts) == n_batches * n_queries
    results["cold_pipelined_qps"] = round(n_batches * n_queries / total, 1)
    log(f"cold pipelined: {n_batches} batches in {total * 1e3:.1f} ms "
        f"({results['cold_pipelined_qps']} qps) "
        f"misses={engine.pool_misses - m0} "
        f"updates={engine.pool_update_dispatches - u0}")
    results["rows"] = n_rows
    results["partitions"] = n_partitions
    results["pool_slots"] = engine.pool_slots
    print(json.dumps(results))


if __name__ == "__main__":
    main()
