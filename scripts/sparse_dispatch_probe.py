"""Isolate the sparse-dispatch cost seen at 1M x 16 partitions (p50 609 ms
vs ~27 ms dense): time the fused interpreter, the densify stage alone, and
the VM alone at the same shape buckets (bank rows shrunk — the VM only
touches addressed rows).

  python scripts/sparse_dispatch_probe.py [P] [K] [E_budget] [W] [stream_len]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from lapis_silo_tpu.ops import device_engine as de


def _force(result):
    """Pull one element to the host — through the relay, block_until_ready
    alone does not wait for execution."""
    leaf = jax.tree_util.tree_leaves(result)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])  # 4-byte pull, not the array


def timed(name, fn, variants):
    """variants: list of arg tuples with DISTINCT contents — the relay
    memoizes repeated identical executions, faking timings."""
    _force(fn(*variants[0]))  # compile
    best = float("inf")
    for args in variants[1:]:
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms (incl ~25 ms RTT)", flush=True)


def main():
    argv = sys.argv[1:]
    P = int(argv[0]) if len(argv) > 0 else 16
    K = int(argv[1]) if len(argv) > 1 else 492
    EB = int(argv[2]) if len(argv) > 2 else 32768
    W = int(argv[3]) if len(argv) > 3 else 2048
    E = int(argv[4]) if len(argv) > 4 else 2 << 20
    bucket, n_dyn, n_regs, R = 4096, 1, 4, 256

    rng = np.random.default_rng(0)
    stream_idx = jax.device_put(
        rng.integers(0, W, size=(P, E), dtype=np.int32))
    stream_words = jax.device_put(
        rng.integers(0, 2**32, size=(P, E), dtype=np.uint32))
    starts = rng.integers(0, E - EB // K - 1, size=(P, K), dtype=np.int32)
    lens = rng.integers(1, max(2, EB // K), size=(P, K), dtype=np.int32)
    bank = jax.device_put(np.zeros((P, R, W), dtype=np.uint32))
    dyn = jax.device_put(np.zeros((P, n_dyn, W), dtype=np.uint32))
    full = jax.device_put(
        rng.integers(0, 2**32, size=(P, W), dtype=np.uint32))

    # a trivial 2-instruction count program: reg0 = FULL; reg0 &= SPARSE[0]
    code = np.zeros((3, bucket), dtype=np.int32)
    code[0, :] = de.NOP
    code[2, :] = de.NO_DST
    code[0, 0] = de.ALU
    code[2, 0] = (de.B_FULL << 28) | (de.M_MOVB << 24)
    code[0, 1] = de.ALU
    code[1, 1] = 0  # sparse row 0
    code[2, 1] = (de.B_SPARSE << 28) | (de.M_AND << 24)
    n_instr = jnp.int32(de._round_instr(2))

    fulls = [jax.device_put(rng.integers(0, 2**32, size=(P, W),
                                         dtype=np.uint32)) for _ in range(4)]
    starts_v = [((starts + 8 * k) % (E - EB // K - 1)).astype(np.int32)
                for k in range(4)]

    # 1. fused sparse interpreter (the serving path)
    run = de._interpreter(bucket, R, n_dyn, K, W, "count", n_regs, EB, P)
    blobs = [jax.device_put(np.concatenate([
        code.reshape(-1),
        s.reshape(-1),
        lens.reshape(-1).astype(np.int32),
    ])) for s in starts_v]
    timed("fused sparse dispatch", run,
          [(b, bank, dyn, stream_idx, stream_words, f, n_instr)
           for b, f in zip(blobs, fulls)])

    # 2. densify stage alone
    dens = de._densify_jit(K, EB, W)
    lens_dev = jax.device_put(lens)
    timed("densify alone        ", dens,
          [(stream_idx, stream_words, jax.device_put(s), lens_dev)
           for s in starts_v])

    # 3. VM alone (k=0, pre-densified zeros input)
    run0 = de._interpreter(bucket, R, n_dyn, 0, W, "count", n_regs)
    code0 = code.copy()
    code0[2, 1] = (de.B_FULL << 28) | (de.M_AND << 24)
    zeros_sparse = jax.device_put(np.zeros((P, 1, W), dtype=np.uint32))
    timed("VM alone (no sparse) ", run0,
          [(jnp.asarray(code0), bank, dyn, zeros_sparse, f, n_instr)
           for f in fulls])


if __name__ == "__main__":
    main()
