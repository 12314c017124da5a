"""Details/Fasta at scale on the live chip: p50 of the full action path
(filter VM + fused compact extraction + host row materialization).

SURVEY "hard parts" called for popcount-prefix-sum + gather extraction so
row-materializing actions do not pull the full [P, W] bitset; the VM's
`compact` output mode (ops/device_engine.evaluate_compact) fuses that
extraction into the filter dispatch. This probe measures the end-to-end
Details action — selective filters with orderBy + limit — at the 10M x 32
flagship shape, and the same queries with the compact path disabled
(SILO_COMPACT_MIN_WORDS huge) for the transfer-cost delta.

Env: SILO_BENCH_ROWS (10485760), SILO_BENCH_LENGTH (29903),
SILO_BENCH_PARTITIONS (32), SILO_BENCH_QUERIES (12).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    if os.environ.get("SILO_BENCH_CPU", "0") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
        os.environ.setdefault("SILO_PALLAS_INTERPRET", "1")
        os.environ.setdefault("SILO_FORCE_BANK3", "1")
    n_rows = int(os.environ.get("SILO_BENCH_ROWS", 10_485_760))
    length = int(os.environ.get("SILO_BENCH_LENGTH", 29903))
    n_partitions = int(os.environ.get("SILO_BENCH_PARTITIONS", 32))
    n_queries = int(os.environ.get("SILO_BENCH_QUERIES", 12))

    from lapis_silo_tpu.ops.device_engine import DeviceEngine
    from lapis_silo_tpu.testing import synthetic_database

    t0 = time.time()
    db = synthetic_database(n_rows=n_rows, length=length,
                            n_partitions=n_partitions)
    log(f"corpus {time.time() - t0:.0f}s")
    t0 = time.time()
    engine = DeviceEngine(db)
    db.device_engine = engine
    log(f"engine up {time.time() - t0:.0f}s "
        f"(compact min words {engine.COMPACT_MIN_WORDS}, "
        f"cap {engine.COMPACT_CAP_WORDS})")

    ref = db.reference_genomes.nucleotide_ids["main"]
    from lapis_silo_tpu.common.symbols import NUCLEOTIDE

    rng = np.random.default_rng(11)

    def query(seed):
        # two non-ref equals OR'd: selective (typically 10-10k rows)
        children = []
        for _ in range(2):
            pos = int(rng.integers(0, length))
            sym = NUCLEOTIDE.chars[(int(ref[pos]) % 4) + 1]
            children.append({"type": "NucleotideEquals", "position": pos + 1,
                             "symbol": sym})
        return json.dumps({
            "action": {"type": "Details",
                       "fields": ["key", "date"],
                       "orderByFields": ["date"], "limit": 50,
                       "offset": seed % 3},
            "filterExpression": {"type": "Or", "children": children},
        })

    queries = [query(s) for s in range(n_queries)]
    # warm (distinct query — relay memoization)
    t0 = time.time()
    db.execute_query(query(999))
    log(f"warm-up {time.time() - t0:.1f}s")

    results = {}
    for label in ("compact", "full_bitset"):
        if label == "full_bitset":
            engine.COMPACT_MIN_WORDS = 1 << 62  # disable the fused path
        times = []
        rows = 0
        for q in queries:
            t0 = time.perf_counter()
            out = db.execute_query(q)
            times.append(time.perf_counter() - t0)
            rows += len(out["queryResult"])
        times.sort()
        p50 = times[len(times) // 2]
        results[f"{label}_p50_ms"] = round(p50 * 1e3, 1)
        log(f"{label}: p50 {p50 * 1e3:.1f} ms over {n_queries} Details "
            f"queries ({rows} rows total)")
    results["rows"] = n_rows
    results["partitions"] = n_partitions
    print(json.dumps(results))


if __name__ == "__main__":
    main()
