"""Mutations-kernel roofline microbench, RTT-free.

A single timed dispatch through the loopback relay carries ~25-28 ms of
round-trip latency, which at 16 in-jit iterations adds ~1.7 ms/iter — enough
to misread a DMA-bound kernel as "50% of peak" (that happened; see
BENCHMARKS.md). This script times the SAME kernel at two iteration counts
and reports the slope (t_hi - t_lo) / (iters_hi - iters_lo): the dispatch
overhead cancels exactly.

  python scripts/roofline.py [rows] [n_stored_rows]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

ITERS_LO, ITERS_HI = 16, 48


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    n_stored = int(sys.argv[2]) if len(sys.argv) > 2 else 90112

    from lapis_silo_tpu.ops import pallas_kernels as pk

    n_words = -(-rows // 32 // 128) * 128
    rng = np.random.default_rng(0)
    bank = rng.integers(0, 2**32, size=(n_stored, n_words), dtype=np.uint32)
    print(f"bank: {bank.nbytes / 1e9:.2f} GB  ({n_stored} rows x {n_words} words)",
          file=sys.stderr)
    bank_dev = jax.device_put(bank)
    # the engine's at-rest layout (DeviceEngine.bank3): same bytes viewed
    # [R, PW/128, 128] — measured separately so a 2-D vs 3-D kernel-path
    # cost difference is visible instead of folded into "chip variance"
    bank3_dev = jax.device_put(bank.reshape(n_stored, n_words // 128, 128))
    filters = jax.device_put(
        rng.integers(0, 2**32, size=(n_words,), dtype=np.uint32))

    def make(iters, which, rb, wb, csa):
        @jax.jit
        def repeat(bank_in, filters):
            def body(i, acc):
                # vary the filter per iteration so XLA cannot CSE the calls
                f = filters ^ i.astype(jnp.uint32)
                if which == "3d":
                    counts = pk.mutation_counts_banked(
                        bank_in, f, 0, n_stored, n_words)
                else:
                    counts = pk.mutation_counts_banked(
                        bank_in, f, 0, n_stored, n_words, rb, wb, csa)
                return acc + counts.sum(dtype=jnp.int32)

            return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

        return repeat

    sweep = [("2d", 256, None, False), ("2d", 256, None, True),
             ("2d", 512, None, False), ("3d", None, None, False)]
    for which, row_block, word_block, use_csa in sweep:
        if which == "2d" and (n_stored % row_block
                              or (word_block and n_words % word_block)):
            continue
        operand = bank3_dev if which == "3d" else bank_dev
        best = {}
        for iters in (ITERS_LO, ITERS_HI):
            fn = make(iters, which, row_block, word_block, use_csa)
            t_best = float("inf")
            for k in range(4):
                t0 = time.perf_counter()
                result = int(fn(operand, filters))  # force to host
                if k:  # first call pays the compile
                    t_best = min(t_best, time.perf_counter() - t0)
            best[iters] = t_best
        per_iter = (best[ITERS_HI] - best[ITERS_LO]) / (ITERS_HI - ITERS_LO)
        bw = bank.nbytes / per_iter / 1e9
        print(f"{which} rb={row_block} wb={word_block} csa={use_csa}: compute "
              f"{per_iter * 1e3:.3f} ms/iter = {bw:.0f} GB/s "
              f"(t{ITERS_LO}={best[ITERS_LO]*1e3:.1f}ms "
              f"t{ITERS_HI}={best[ITERS_HI]*1e3:.1f}ms, result={result})",
              flush=True)


if __name__ == "__main__":
    main()
