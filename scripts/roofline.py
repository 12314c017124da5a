"""Mutations-kernel roofline microbench: K kernel invocations inside one
jit so the per-dispatch relay RTT amortizes away.

  python scripts/roofline.py [rows] [n_stored_rows] [iters]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    n_stored = int(sys.argv[2]) if len(sys.argv) > 2 else 90112
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    from lapis_silo_tpu.ops import pallas_kernels as pk

    n_words = -(-rows // 32 // 128) * 128
    rng = np.random.default_rng(0)
    bank = rng.integers(0, 2**32, size=(1, n_stored, n_words), dtype=np.uint32)
    print(f"bank: {bank.nbytes / 1e9:.2f} GB  ({n_stored} rows x {n_words} words)",
          file=sys.stderr)
    bank_dev = jax.device_put(bank)
    filters = jax.device_put(
        rng.integers(0, 2**32, size=(1, n_words), dtype=np.uint32))

    sweep = [(256, None, True), (256, None, False), (512, None, True)]
    for row_block, word_block, use_csa in sweep:
        if n_stored % row_block or (word_block and n_words % word_block):
            continue

        @functools.partial(jax.jit, static_argnums=())
        def repeat(bank, filters, rb=row_block, wb=word_block, csa=use_csa):
            def body(i, acc):
                # vary the filter per iteration so XLA cannot CSE the calls
                f = filters ^ i.astype(jnp.uint32)
                counts = pk.mutation_counts_banked(bank, f, 0, n_stored, n_words,
                                                   rb, wb, csa)
                return acc + counts.sum(dtype=jnp.int32)

            return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

        times = []
        result = 0
        for k in range(4):
            f_k = jax.device_put(
                rng.integers(0, 2**32, size=(1, n_words), dtype=np.uint32))
            t0 = time.perf_counter()
            result = int(repeat(bank_dev, f_k))  # force the value to the host
            times.append(time.perf_counter() - t0)
        best = min(times[1:])
        per_iter = best / iters
        bw = bank.nbytes / per_iter / 1e9
        print(f"rb={row_block} wb={word_block} csa={use_csa}: best per-iter "
              f"{per_iter * 1e3:.2f} ms, effective {bw:.0f} GB/s "
              f"(result={result})", flush=True)


if __name__ == "__main__":
    main()
