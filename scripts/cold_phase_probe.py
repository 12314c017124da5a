"""Phase breakdown of ONE 10M x 32 cold pool-update batch (uses the
pool_bench snapshot cache): host assembly vs dispatch issue vs readback."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax

from lapis_silo_tpu.ops import device_engine as de
from lapis_silo_tpu.query.engine import Query
from lapis_silo_tpu.testing import sample_count_queries
from lapis_silo_tpu.storage.snapshot import find_newest_snapshot, load_database

tag = "/root/repo/temp/snapcache/10485760_29903_32"
t0 = time.time()
db = load_database(find_newest_snapshot(tag))
print(f"snapshot loaded {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
engine = de.DeviceEngine(db)
jax.block_until_ready(engine.bank)
print(f"engine up {time.time()-t0:.0f}s pool={engine.pool_slots}", flush=True)

nq = 8192
batches = [[engine.lower(Query(q).filter)[0] for q in
            sample_count_queries(db, n_queries=nq, seed=900 + i)]
           for i in range(3)]
# warm compile with batch 0 (untimed)
engine.count_programs(batches[0], min_bucket=de._BATCH_LEN_BUCKETS[-1])
for progs in batches[1:]:
    m0, f0 = engine.pool_misses, engine.pool_fused_chunks
    t0 = time.perf_counter()
    results, device_idx, dispatches = engine.count_split(
        progs, min_bucket=de._BATCH_LEN_BUCKETS[-1])
    t_issue = time.perf_counter() - t0
    engine.count_finish(results, device_idx, dispatches)
    t_total = time.perf_counter() - t0
    print(f"cold batch: issue {t_issue*1e3:.0f}ms readback "
          f"{(t_total-t_issue)*1e3:.0f}ms total {t_total*1e3:.0f}ms "
          f"({nq/t_total:.0f} qps) misses={engine.pool_misses-m0} "
          f"fused_chunks={engine.pool_fused_chunks-f0} "
          f"dispatches={len(dispatches)}", flush=True)
