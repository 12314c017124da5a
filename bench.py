"""Benchmark: mutation-filter count queries/sec on the resident chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra detail goes to stderr. Knobs (env):
  SILO_BENCH_ROWS        corpus size            (default 65536)
  SILO_BENCH_LENGTH      genome length          (default 29903)
  SILO_BENCH_PARTITIONS  partitions             (default 1)
  SILO_BENCH_QUERIES     measured queries       (default 128)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    n_rows = int(os.environ.get("SILO_BENCH_ROWS", 65536))
    length = int(os.environ.get("SILO_BENCH_LENGTH", 29903))
    n_partitions = int(os.environ.get("SILO_BENCH_PARTITIONS", 1))
    n_queries = int(os.environ.get("SILO_BENCH_QUERIES", 512))

    import jax

    # Persistent compile cache: repeated bench runs skip the (slow) TPU
    # compiles entirely.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as ex:  # noqa: BLE001
        log(f"compile cache unavailable: {ex}")

    log(f"devices: {jax.devices()}")

    from lapis_silo_tpu.ops.device_engine import DeviceEngine
    from lapis_silo_tpu.query.engine import Query
    from lapis_silo_tpu.testing import sample_count_queries, synthetic_database

    t0 = time.time()
    db = synthetic_database(n_rows=n_rows, length=length, n_partitions=n_partitions)
    log(f"synthetic corpus built: {n_rows} rows x {length} positions "
        f"({n_partitions} partitions) in {time.time() - t0:.1f}s")

    t0 = time.time()
    engine = DeviceEngine(db)
    jax.block_until_ready(engine.bank)
    bank_gb = engine.bank.nbytes / 1e9
    sparse_gb = (sum(a.nbytes for a in engine.sparse_stream) / 1e9
                 if engine.sparse_stream is not None else 0.0)
    log(f"bank resident: dense {bank_gb:.2f} GB ({engine.n_rows} rows) + "
        f"sparse stream {sparse_gb:.2f} GB ({engine.n_sparse} rows) "
        f"in {time.time() - t0:.1f}s")

    queries = [Query(q) for q in sample_count_queries(db, n_queries=n_queries)]

    # One shared executable for both latency and throughput measurements:
    # everything runs through the batch interpreter at fixed buckets
    # (program length AND sparse-leaf K/M — each remote compile is minutes).
    programs = [engine.lower(q.filter)[0] for q in queries]
    total_len = sum(len(p.opcodes) + 1 for p in programs)
    bucket = next((b for b in (64, 256, 1024, 4096, 8192) if b >= total_len),
                  8192)  # larger batches split into multiple dispatches
    # sparse floors come from the engine's shape LADDER (the serving
    # behavior): pinning the whole batch union here inflated every
    # split-out sub-dispatch to the union's E budget
    min_k, min_e = engine.sparse_floors(programs)
    floors = {"min_bucket": bucket, "min_sparse_k": min_k, "min_sparse_e": min_e}
    t0 = time.time()
    engine.count_batch([queries[0].filter], **floors)
    log(f"warm-up (batch executable, bucket {bucket}, sparse K>={min_k} E>={min_e}) "
        f"in {time.time() - t0:.1f}s")
    # Latency path uses the engine's sparse shape LADDER (each distinct rung
    # compiles once) — one untimed pass warms them all.
    t0 = time.time()
    for query in queries:
        engine.count_batch([query.filter], min_bucket=bucket)
    log(f"latency-rung warm-up (ladder {engine.sparse_shape_ladder}) "
        f"in {time.time() - t0:.1f}s")

    profile_dir = os.environ.get("SILO_BENCH_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    # Latency: synchronous round-trips (client-visible p50), engine-chosen
    # sparse shapes (the serving path's behavior).
    latencies = []
    counts = []
    for query in queries:
        t0 = time.perf_counter()
        counts.append(engine.count_batch([query.filter], min_bucket=bucket)[0])
        latencies.append(time.perf_counter() - t0)
    latencies.sort()
    p50 = latencies[len(latencies) // 2]

    # Mutations action (the HBM-bound reduction). Warm with a DIFFERENT
    # filter than the timed call: relayed TPU backends memoize identical
    # executions, which would fake the timing. Both filters must be
    # SELECTIVE (0 < count < N) — full/empty filters hit the stored-
    # cardinality fast path and measure nothing.
    selective = [q for q, c in zip(queries, counts) if 0 < c < n_rows]
    if len(selective) < 2:
        selective = queries[:2]
    engine.mutation_counts("nuc", "main", engine.evaluate(selective[0].filter))
    words = engine.evaluate(selective[1].filter)
    t0 = time.perf_counter()
    matrix = engine.mutation_counts("nuc", "main", words)
    mutations_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    full_matrix = engine.mutation_counts(
        "nuc", "main",
        engine.evaluate(Query(json.dumps({
            "action": {"type": "Aggregated"},
            "filterExpression": {"type": "True"},
        })).filter))
    log(f"mutations full-filter fast path: {(time.perf_counter()-t0)*1e3:.1f} ms "
        f"(stored cardinalities), total={int(full_matrix.sum())}")
    meta = engine.segment_meta[("nuc", "main")]
    seg_bytes = meta["n_stored"] * engine.n_words * 4 * n_partitions
    if engine.sparse_stream is not None:
        seg_bytes += sum(int(a.nbytes) for a in engine.sparse_stream)
    log(f"mutations reduction: {mutations_s * 1e3:.1f} ms over "
        f"{seg_bytes / 1e9:.2f} GB stored rows -> "
        f"{seg_bytes / mutations_s / 1e9:.0f} GB/s effective "
        f"(pallas={engine.use_pallas}); nonzero cells={int((matrix > 0).sum())}")

    # Throughput: batched — the whole query batch executes as ONE device
    # dispatch (vmap over the query axis), amortizing the dispatch
    # round-trip; successive batches PIPELINE (issue without blocking, the
    # way the micro-batcher keeps the device busy under live traffic).
    batch_counts = engine.count_batch([q.filter for q in queries], **floors)
    assert batch_counts == counts
    lowered = [engine.lower(q.filter)[0] for q in queries]
    repeats = 5
    # Rotate the batch per repeat: relayed TPU backends memoize
    # byte-identical executions, so every repeat must pack a distinct
    # instruction blob to actually touch the chip.
    t_start = time.perf_counter()
    in_flight = []
    for r in range(repeats):
        in_flight.extend(engine.count_dispatches(
            lowered[r:] + lowered[:r], floors["min_bucket"],
            floors["min_sparse_k"], floors["min_sparse_e"]))
    for arr, _n in in_flight:
        try:
            arr.copy_to_host_async()
        except Exception:  # noqa: BLE001
            pass
    forced = [np.asarray(arr)[:n] for arr, n in in_flight]
    total = time.perf_counter() - t_start
    got = [c for f in forced for c in f]
    want = [counts[(r + i) % len(counts)]
            for r in range(repeats) for i in range(len(counts))]
    assert got == want, (got[:8], want[:8])
    qps = repeats * len(queries) / total
    if profile_dir:
        jax.profiler.stop_trace()
        log(f"profiler trace written to {profile_dir}")
    seqs_per_sec = qps * n_rows
    log(f"queries: {len(queries)}  qps={qps:.1f}  p50={p50 * 1e3:.2f} ms  "
        f"filtered seqs/s/chip={seqs_per_sec:.3g}  counts[:5]={counts[:5]}")

    # vs_baseline: ratio against the checked-in BASELINE_BENCH.json (pinned
    # to round 1's driver measurement — the reference publishes no numbers,
    # BASELINE.md). Falls back to the newest BENCH_r{N}.json driver record
    # (whose value may be nested under "parsed").
    vs_baseline = None
    try:
        import glob
        import re

        here = os.path.dirname(os.path.abspath(__file__))
        candidates = [os.path.join(here, "BASELINE_BENCH.json")]
        records = []
        for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
            match = re.search(r"BENCH_r(\d+)\.json$", path)
            if match:
                records.append((int(match.group(1)), path))
        if records:
            candidates.append(max(records)[1])
        for path in candidates:
            if not os.path.exists(path):
                continue
            with open(path) as f:
                previous = json.load(f)
            baseline_value = previous.get("value") or previous.get(
                "parsed", {}).get("value")
            if baseline_value:
                vs_baseline = round(qps / float(baseline_value), 3)
                log(f"vs_baseline={vs_baseline} against {os.path.basename(path)} "
                    f"({baseline_value})")
                break
    except Exception as ex:  # noqa: BLE001
        log(f"vs_baseline unavailable: {ex}")

    print(json.dumps({
        "metric": "mutation_filter_count_queries_per_sec",
        "value": round(qps, 2),
        "unit": f"queries/s ({n_rows} seqs x {length} pos, batch {len(queries)}, 1 chip)",
        "vs_baseline": vs_baseline,
    }))


if __name__ == "__main__":
    main()
