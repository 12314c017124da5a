"""Decompose the sparse-tier Mutations reduction cost on the live chip.

Times, at the 1M-corpus shape (nnz ~31M entries, W=32768, n_sparse ~90k):
  gather    popcount(words & filt[idx])          (random gather from [W])
  cumsum    jnp.cumsum over nnz uint32
  bounds    boundary gather of n_sparse (hi - lo)
  fused     the production _sparse_mutation_counts_jit
Each is its own executable; dispatch RTT is amortized with an in-jit
repeat (fori_loop over distinct offsets) like scripts/roofline.py.
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from lapis_silo_tpu.ops import device_engine as de  # noqa: E402

NNZ = int(sys.argv[1]) if len(sys.argv) > 1 else 31_000_000
NNZ = -(-NNZ // 1024) * 1024  # combine_stream needs a COMBINE_BLOCK multiple
N_WORDS = 32768
N_SPARSE = 89_709
REPS = 8


def timed(name, fn, *args):
    # the relay memoizes byte-identical executions: every timed call must
    # carry a DISTINCT offset scalar (threaded into the in-jit repeat loop)
    t0 = time.time()
    np.asarray(fn(jnp.uint32(0), *args))  # block_until_ready does NOT block
    compile_s = time.time() - t0          # through the relay; materialize
    t0 = time.perf_counter()
    np.asarray(fn(jnp.uint32(1), *args))
    once = time.perf_counter() - t0
    per = (once - 0.025) / REPS  # subtract one dispatch RTT
    print(f"{name:8s} compile {compile_s:6.1f}s  run {once*1e3:8.1f} ms "
          f"(~{per*1e3:6.1f} ms/rep after RTT)", flush=True)


def main():
    print(f"devices: {jax.devices()}  nnz={NNZ}", file=sys.stderr)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N_WORDS, NNZ, dtype=np.int32))
    words = jnp.asarray(
        rng.integers(0, 2**32, NNZ, dtype=np.uint64).astype(np.uint32))
    filt = jnp.asarray(
        rng.integers(0, 2**32, N_WORDS, dtype=np.uint64).astype(np.uint32))
    lens_h = rng.multinomial(NNZ, np.ones(N_SPARSE) / N_SPARSE).astype(np.int32)
    starts_h = np.zeros(N_SPARSE, dtype=np.int32)
    np.cumsum(lens_h[:-1], out=starts_h[1:])
    starts = jnp.asarray(starts_h)
    lens = jnp.asarray(lens_h)

    def rep(body):
        def run(base, *args):
            def step(i, acc):
                return acc + body(*args, base + jnp.uint32(i))
            return jax.lax.fori_loop(0, REPS, step, jnp.uint32(0))
        return jax.jit(run)

    timed("gather", rep(
        lambda idx, words, filt, i:
        jax.lax.population_count(
            words & filt[((idx.astype(jnp.uint32) + i) % N_WORDS)
                         .astype(jnp.int32)]
        ).astype(jnp.uint32).sum()), idx, words, filt)

    timed("popsum", rep(
        lambda words, i:
        jax.lax.population_count(words + i).astype(jnp.uint32).sum()), words)

    timed("cumsum", rep(
        lambda words, i: jnp.cumsum(words + i)[-1]), words)

    timed("bounds", rep(
        lambda words, starts, lens, i:
        (words[jnp.clip(starts + lens - 1 + (i % 2).astype(jnp.int32),
                        0, NNZ - 1)]
         - words[jnp.clip(starts - 1, 0, NNZ - 1)]).sum()),
        words, starts, lens)

    # the production kernel (adds the [P] partition axis)
    def fused(idx, words, filt, starts, lens, i):
        from lapis_silo_tpu.ops import pallas_kernels as pk

        comb = pk.combine_stream(idx, words + i)
        out = de._sparse_mutation_counts_jit(comb, filt, starts, lens, 1)
        return out.sum()
    timed("fused", rep(fused), idx, words, filt, starts, lens)


if __name__ == "__main__":
    main()
