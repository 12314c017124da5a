"""Stage-by-stage timing of the production Mutations path at scale.

Builds the bench corpus (default 1M x 29903), then times for several
DISTINCT selective filters (the relay memoizes identical executions):
  evaluate   filter VM -> host words ([P, W] download)
  upload     _filters_for device_put of the filter words
  reduce     _sparse_mutation_counts_jit dispatch + result download
  total      engine.mutation_counts("nuc", "main", words)
  total_dev  engine.mutation_counts with a device-resident DeviceFilter

Usage: SILO_BENCH_ROWS=1048576 python scripts/mutations_profile.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    n_rows = int(os.environ.get("SILO_BENCH_ROWS", 1048576))
    import jax

    print(f"devices: {jax.devices()}", file=sys.stderr)
    from lapis_silo_tpu.ops import device_engine as de
    from lapis_silo_tpu.query.engine import Query
    from lapis_silo_tpu.testing import sample_count_queries, synthetic_database

    t0 = time.time()
    db = synthetic_database(n_rows=n_rows, length=29903, n_partitions=1)
    engine = de.DeviceEngine(db)
    jax.block_until_ready(engine.bank)
    print(f"corpus+engine: {time.time() - t0:.1f}s  n_sparse={engine.n_sparse}",
          file=sys.stderr)

    queries = [Query(q) for q in sample_count_queries(db, n_queries=12)]
    words_list = [(q, engine.evaluate(q.filter)) for q in queries]
    # warm all executables
    q0, w0 = words_list[0]
    engine.mutation_counts("nuc", "main", w0)
    engine._sparse_counts_memo = None
    engine._filters_memo = None

    for qi, (q, words) in enumerate(words_list[1:5], 1):
        t0 = time.perf_counter()
        w = engine.evaluate(q.filter)
        t_eval = time.perf_counter() - t0

        engine._filters_memo = None
        engine._sparse_counts_memo = None
        t0 = time.perf_counter()
        filters = engine._filters_for(w)
        jax.block_until_ready(filters)
        t_upload = time.perf_counter() - t0

        (stream_comb,) = engine.sparse_stream
        starts, lens = engine._sparse_bounds_dev
        t0 = time.perf_counter()
        out = np.asarray(de._sparse_mutation_counts_jit(
            stream_comb, filters, starts, lens, engine.n_partitions))
        t_reduce = time.perf_counter() - t0

        engine._filters_memo = None
        engine._sparse_counts_memo = None
        t0 = time.perf_counter()
        engine.mutation_counts("nuc", "main", w)
        t_total = time.perf_counter() - t0

        engine._filters_memo = None
        engine._sparse_counts_memo = None
        t0 = time.perf_counter()
        dev = engine.device_filter(q.filter)
        engine.mutation_counts("nuc", "main", dev)
        t_total_dev = time.perf_counter() - t0

        print(f"q{qi}: evaluate {t_eval*1e3:7.1f} ms  upload {t_upload*1e3:6.1f} ms  "
              f"reduce {t_reduce*1e3:7.1f} ms  total {t_total*1e3:7.1f} ms  "
              f"total_dev {t_total_dev*1e3:7.1f} ms  out_sum={int(out.sum())}",
              flush=True)


if __name__ == "__main__":
    main()
