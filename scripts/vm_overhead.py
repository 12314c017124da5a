"""Probe the filter VM's per-instruction cost on the live chip.

The interpreter executable takes `n_instr` as a traced scalar, so ONE
compile serves every program length: we time the same executable at
several n_instr values and opcode mixes and read the slope.

Mixes:
  nop        pure NOPs                 -> fixed while_loop/switch overhead
  push_and   PUSH_STATIC,PUSH_STATIC,AND,EMIT repeat -> + gather & word op
  push_dyn   PUSH_DYN variant          -> dyn-bank gather cost
  th         threshold chain           -> count-buffer update cost

Usage: python scripts/vm_overhead.py [n_words] (default 32768 = 1M seqs)
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from lapis_silo_tpu.ops import device_engine as de  # noqa: E402

N_WORDS = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
N_ROWS = 64
BUCKET = 4096
N_DYN = 4


def build_code(mix: str) -> np.ndarray:
    ops: list[tuple[int, int]] = []
    qi = 0
    rng = np.random.default_rng(0)

    def emit():
        nonlocal qi
        ops.append((de.EMIT_COUNT, qi % de.MAX_BATCH_QUERIES))
        qi += 1

    while len(ops) < BUCKET - 8:
        if mix == "nop":
            ops.append((de.NOP, 0))
        elif mix == "push_and":
            ops.append((de.PUSH_STATIC, int(rng.integers(N_ROWS))))
            ops.append((de.PUSH_STATIC, int(rng.integers(N_ROWS))))
            ops.append((de.OP_AND, 0))
            emit()
        elif mix == "push_dyn":
            ops.append((de.PUSH_DYN, int(rng.integers(N_DYN))))
            ops.append((de.PUSH_DYN, int(rng.integers(N_DYN))))
            ops.append((de.OP_OR, 0))
            emit()
        elif mix == "th":
            ops.append((de.TH_PUSH, 0))
            for _ in range(3):
                ops.append((de.PUSH_STATIC, int(rng.integers(N_ROWS))))
                ops.append((de.TH_ADD, 0))
            ops.append((de.TH_GE, 2))
            emit()
        else:
            raise SystemExit(f"unknown mix {mix}")
    code = np.zeros((2, BUCKET), dtype=np.int32)
    code[0, :] = de.NOP
    for i, (op, operand) in enumerate(ops):
        code[0, i] = op
        code[1, i] = operand
    return code


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(1)
    bank = jnp.asarray(
        rng.integers(0, 2**32, size=(1, N_ROWS, N_WORDS), dtype=np.uint64)
        .astype(np.uint32)
    )
    dyn = jnp.asarray(
        rng.integers(0, 2**32, size=(1, N_DYN, N_WORDS), dtype=np.uint64)
        .astype(np.uint32)
    )
    sparse = jnp.zeros((1, 1, N_WORDS), jnp.uint32)
    full = jnp.full((1, N_WORDS), 0xFFFFFFFF, jnp.uint32)
    run = de._interpreter(BUCKET, N_ROWS, N_DYN, 0, N_WORDS, "multi_count",
                          stack_slots=4, count_slots=4)
    codes = {mix: jnp.asarray(build_code(mix))
             for mix in ("nop", "push_and", "push_dyn", "th")}
    t0 = time.time()
    run(codes["nop"], bank, dyn, sparse, full, jnp.int32(4)).block_until_ready()
    print(f"compile: {time.time() - t0:.1f}s", file=sys.stderr)

    lens = (64, 512, 2048, 4096)
    for mix, code in codes.items():
        times = []
        for n in lens:
            # warm this n once (no recompile: n_instr is traced)
            run(code, bank, dyn, sparse, full, jnp.int32(n)).block_until_ready()
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                out = run(code, bank, dyn, sparse, full, jnp.int32(n))
            out.block_until_ready()
            times.append((time.perf_counter() - t0) / reps)
        slope_us = (times[-1] - times[0]) / (lens[-1] - lens[0]) * 1e6
        detail = "  ".join(f"{n}:{t*1e3:.1f}ms" for n, t in zip(lens, times))
        print(f"{mix:9s} {detail}  slope={slope_us:.1f} us/instr")


if __name__ == "__main__":
    main()
