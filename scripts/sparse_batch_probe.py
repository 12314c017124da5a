"""Component timing of the sparse-tier 512-query batch path on the REAL
engine (the flagged round-2 item: sparse batches measured ~6x slower than
dense at 1M x 16 partitions).

Builds a synthetic corpus with the sparse tier FORCED on, then times:
  1. end-to-end 512-query micro-batches (the serving path),
  2. the densify executable alone at the batch's pinned (K, E) shape,
  3. a dense-only batch (sparse leaves rewritten to B_ZERO) at the same
     instruction shapes — isolates the VM + dispatch cost.

Env: SILO_BENCH_ROWS (1048576), SILO_BENCH_LENGTH (29903),
SILO_BENCH_PARTITIONS (16), SILO_BENCH_QUERIES (512).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SILO_DENSE_BANK_BUDGET_GB", "0.05")  # force sparse

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    n_rows = int(os.environ.get("SILO_BENCH_ROWS", 1 << 20))
    length = int(os.environ.get("SILO_BENCH_LENGTH", 29903))
    n_partitions = int(os.environ.get("SILO_BENCH_PARTITIONS", 16))
    n_queries = int(os.environ.get("SILO_BENCH_QUERIES", 512))

    import jax

    from lapis_silo_tpu.ops import device_engine as de
    from lapis_silo_tpu.query.engine import Query
    from lapis_silo_tpu.testing import sample_count_queries, synthetic_database

    t0 = time.time()
    db = synthetic_database(n_rows=n_rows, length=length,
                            n_partitions=n_partitions)
    log(f"corpus {time.time() - t0:.0f}s")
    t0 = time.time()
    engine = de.DeviceEngine(db)
    jax.block_until_ready(engine.bank)
    log(f"engine up {time.time() - t0:.0f}s: dense rows={engine.n_rows} "
        f"sparse rows={engine.n_sparse} "
        f"stream={sum(a.nbytes for a in engine.sparse_stream) / 1e6:.0f} MB "
        f"ladder={engine.sparse_shape_ladder} "
        f"max_sparse_k={engine.max_sparse_k}")

    # distinct query sets per repeat (relay memoization guard)
    batches = []
    for seed in range(3):
        queries = sample_count_queries(db, n_queries=n_queries, seed=seed + 1)
        batches.append([engine.lower(Query(q).filter)[0] for q in queries])
    leaves0 = {r for p in batches[0] for r in p.sparse_leaves}
    entries0 = int(engine.sparse_lengths[sorted(leaves0)].sum()) if leaves0 else 0
    log(f"batch profile: {len(batches[0])} queries, "
        f"{sum(len(p.opcodes) for p in batches[0])} instructions, "
        f"{len(leaves0)} distinct sparse leaves, {entries0} stream entries")

    # 1. end-to-end micro-batch path
    min_k, min_e = engine.sparse_floors(batches[0])
    log(f"pinned floors: K={min_k} E={min_e}")
    engine.count_programs(batches[0], min_bucket=de._BATCH_LEN_BUCKETS[-1],
                          min_sparse_k=min_k, min_sparse_e=min_e)  # warm
    for i, progs in enumerate(batches[1:], 1):
        k, e = engine.sparse_floors(progs)
        t0 = time.perf_counter()
        counts = engine.count_programs(
            progs, min_bucket=de._BATCH_LEN_BUCKETS[-1],
            min_sparse_k=k, min_sparse_e=e)
        dt = time.perf_counter() - t0
        log(f"end-to-end batch {i}: {dt * 1e3:.1f} ms "
            f"({len(progs) / dt:.0f} qps), floors K={k} E={e}, "
            f"nonzero={sum(1 for c in counts if c)}")

    # 2. densify alone at the same pinned shape
    if min_k:
        from lapis_silo_tpu.ops import pallas_kernels as pk

        leaves = sorted({r for p in batches[1] for r in p.sparse_leaves})
        k_b, e_b, sp = engine._assemble_sparse(leaves, min_k, min_e)
        use_kernel = pk.HAVE_PALLAS and engine.use_pallas
        if use_kernel:
            dens = jax.jit(functools.partial(
                pk.densify_rows, n_sparse_k=k_b,
                n_words=engine.n_flat_words))
        else:
            dens = de._densify_jit(k_b, e_b, engine.n_flat_words,
                                   engine.n_partitions)
        out = dens(engine.sparse_stream[0],
                   jax.device_put(sp[0]), jax.device_put(sp[1]))
        np.asarray(out[0, 0])  # compile + run
        for i, progs in enumerate(batches[2:], 1):
            leaves = sorted({r for p in progs for r in p.sparse_leaves})
            k_b2, e_b2, sp2 = engine._assemble_sparse(leaves, min_k, min_e)
            if (k_b2, e_b2) != (k_b, e_b):
                log(f"densify shape changed ({k_b2},{e_b2}); skipping")
                continue
            t0 = time.perf_counter()
            out = dens(engine.sparse_stream[0],
                       jax.device_put(sp2[0]), jax.device_put(sp2[1]))
            np.asarray(out[0, 0])
            log(f"densify alone {i} (K={k_b} E={e_b} kernel={use_kernel}): "
                f"{(time.perf_counter() - t0) * 1e3:.1f} ms")

    # 3. same batches with sparse leaves neutralized (B_ZERO): VM-only cost
    for progs in batches[:1]:
        for p in progs:
            for j in range(len(p.opcodes)):
                if (p.regspec[j] >> 28) & 0xF == de.B_SPARSE:
                    p.regspec[j] = (p.regspec[j] & ~(0xF << 28)) | (
                        de.B_ZERO << 28)
            p.sparse_leaves = []
            p._sparse_cache = {}
    engine.count_programs(batches[0],
                          min_bucket=de._BATCH_LEN_BUCKETS[-1])  # warm
    for rep in range(2):
        t0 = time.perf_counter()
        engine.count_programs(batches[0],
                              min_bucket=de._BATCH_LEN_BUCKETS[-1])
        log(f"dense-only batch (B_ZERO rewrite) rep{rep}: "
            f"{(time.perf_counter() - t0) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
