"""Standalone densify-kernel microbench at the 10M x 32 cold-sweep
geometry — no corpus build: synthesizes a partition-major combined stream
with pool_bench-like segment sizes directly.

Cold sweeps are bound by ~1.55 us/segment of per-segment fixed cost in
ops/pallas_kernels.densify_rows (VERDICT r4 item 4). This probe times the
kernel alone (in-jit two-point iteration, dispatch RTT cancelled) so
kernel changes A/B in minutes instead of via 20-minute 10M corpus
builds.

  python scripts/densify_probe.py [k_leaves] [entries_per_segment]

Env: SILO_DENSIFY_MXU / SILO_DENSIFY_BOUNDED as in the kernel.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def build_stream(n_leaves, n_parts, words_per_part, per_seg, seed=0):
    """Partition-major stream: for partition pi, leaves in order, each
    segment `per_seg` sorted word indices inside pi's window. Returns
    (comb, starts [K*P], lens [K*P]) matching DeviceEngine's layout."""
    from lapis_silo_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(seed)
    idx_chunks = []
    starts = np.zeros((n_leaves, n_parts), np.int64)
    lens = np.full((n_leaves, n_parts), per_seg, np.int64)
    off = 0
    for pi in range(n_parts):
        base = pi * words_per_part
        for leaf in range(n_leaves):
            starts[leaf, pi] = off
            w = np.sort(rng.choice(words_per_part, size=per_seg,
                                   replace=False))
            idx_chunks.append(base + w)
            off += per_seg
    idx = np.concatenate(idx_chunks).astype(np.int32)
    pad = -(-(len(idx) + pk.DENSIFY_WINDOW) // pk.SPARSE_CHUNK) * pk.SPARSE_CHUNK
    pad = -(-pad // pk.COMBINE_BLOCK) * pk.COMBINE_BLOCK
    sp_idx = np.zeros(pad, np.int32)
    sp_words = np.zeros(pad, np.uint32)
    sp_idx[: len(idx)] = idx
    sp_words[: len(idx)] = rng.integers(1, 1 << 32, size=len(idx),
                                        dtype=np.uint32)
    comb = pk.combine_stream(sp_idx, sp_words)
    return comb, starts.reshape(-1).astype(np.int32), \
        lens.reshape(-1).astype(np.int32), sp_idx, sp_words


def main():
    if os.environ.get("SILO_BENCH_CPU", "0") == "1":
        # the sitecustomize force-selects the axon TPU backend via
        # jax.config; the env var alone cannot override it
        jax.config.update("jax_platforms", "cpu")
    # 10M x 32 geometry: 10240 words/partition, 32 partitions
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    per_seg = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    n_parts = int(os.environ.get("SILO_PROBE_PARTS", 32))
    words_per_part = int(os.environ.get("SILO_PROBE_WORDS", 10240))
    n_words = n_parts * words_per_part

    from lapis_silo_tpu.ops import pallas_kernels as pk

    comb, starts, lens, sp_idx, sp_words = build_stream(
        k, n_parts, words_per_part, per_seg)
    print(f"stream: {comb.nbytes / 1e6:.0f} MB, K={k} x P={n_parts} "
          f"segments of {per_seg} entries, PW={n_words}", file=sys.stderr)
    comb_dev = jax.device_put(comb)
    starts_dev = jax.device_put(starts)
    lens_dev = jax.device_put(lens)
    part_h0 = pk.bounded_part_h0(n_parts, n_words)
    assert part_h0 is not None

    # correctness once (host oracle)
    rows = np.asarray(pk.densify_rows(comb_dev, starts_dev, lens_dev, k,
                                      n_words, part_h0=part_h0))
    want = np.zeros((k, n_words), np.uint32)
    # rebuild expected from the stream directly
    for pi in range(n_parts):
        for leaf in range(k):
            seg = slice(int(starts[leaf * n_parts + pi]),
                        int(starts[leaf * n_parts + pi]) + per_seg)
            want[leaf, sp_idx[seg]] = sp_words[seg]
    np.testing.assert_array_equal(rows, want)
    print("bit-exact vs host oracle", file=sys.stderr)

    def make(iters):
        @jax.jit
        def repeat(comb_in, starts_in, lens_in):
            def body(i, acc):
                # loop-CARRIED start perturbation (0 or 1): XLA cannot
                # hoist the loop-invariant call out of the fori_loop
                shift = (acc & jnp.uint32(1)).astype(jnp.int32)
                r = pk.densify_rows(comb_in, starts_in + shift, lens_in,
                                    k, n_words, part_h0=part_h0)
                return acc ^ r[0, 0]

            return jax.lax.fori_loop(0, iters, body, jnp.uint32(0))

        return repeat

    best = {}
    for iters in (1, 5):
        fn = make(iters)
        int(fn(comb_dev, starts_dev, lens_dev))  # compile
        t = float("inf")
        for rep in range(3):
            # DISTINCT inputs per rep: the relay memoizes identical
            # executions (start shift <= 3 stays within the padded stream)
            s_r = jax.device_put(starts + rep)
            t0 = time.perf_counter()
            int(fn(comb_dev, s_r, lens_dev))
            t = min(t, time.perf_counter() - t0)
        best[iters] = t
    per_iter = (best[5] - best[1]) / 4
    n_seg = k * n_parts
    print(f"densify: {per_iter * 1e3:.2f} ms/call = "
          f"{per_iter / n_seg * 1e9:.0f} ns/segment "
          f"({per_iter / (n_seg * per_seg) * 1e9:.1f} ns/entry; "
          f"t1={best[1] * 1e3:.1f}ms t5={best[5] * 1e3:.1f}ms)",
          flush=True)


if __name__ == "__main__":
    main()
