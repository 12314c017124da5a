"""Probe the filter VM's per-instruction cost on the live chip.

The interpreter executable takes `n_instr` as a traced scalar, so ONE
compile serves every program length: we time the same executable at
several n_instr values and opcode mixes and read the slope.

Mixes (register-machine ISA):
  nop        pure NOPs                  -> fixed while_loop overhead
  load_alu   LOAD_STATIC x2, ALU AND, EMIT -> + bank gathers & word op
  load_dyn   LOAD_DYN variant           -> dyn-bank gather cost
  th         3-of-2 threshold circuits  -> adder/comparator ALU chains

Usage: python scripts/vm_overhead.py [n_words] [n_partitions]
(default 32768 x 1 = 1M seqs unpartitioned; 10240 x 32 = the 10M
reference-like partitioned layout)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from lapis_silo_tpu.ops import device_engine as de  # noqa: E402

N_WORDS = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
N_PART = int(sys.argv[2]) if len(sys.argv) > 2 else 1
N_ROWS = int(sys.argv[3]) if len(sys.argv) > 3 else 64
BUCKET = 4096
N_DYN = 4
N_REGS = int(sys.argv[4]) if len(sys.argv) > 4 else 8


def build_code(mix: str, seed: int = 0) -> np.ndarray:
    ops: list[tuple[int, int, int]] = []  # (opcode, operand, regspec)
    qi = 0
    rng = np.random.default_rng(seed)

    def spec(dst=de.NO_DST, ra=0, rb=0, mode=0, bsrc=de.B_REG):
        return dst | (ra << 8) | (rb << 16) | (mode << 24) | (bsrc << 28)

    def load(dst, bsrc=de.B_BANK, hi=N_ROWS):
        ops.append((de.ALU, int(rng.integers(hi)),
                    spec(dst, mode=de.M_MOVB, bsrc=bsrc)))

    def alu(mode, dst, ra, rb=0):
        ops.append((de.ALU, 0, spec(dst, ra, rb, mode)))

    def alu_src(mode, dst, ra, bsrc, hi):
        ops.append((de.ALU, int(rng.integers(hi)),
                    spec(dst, ra, 0, mode, bsrc)))

    def emit():
        nonlocal qi
        ops.append((de.EMIT_COUNT, qi % de.MAX_BATCH_QUERIES, spec()))
        qi += 1

    # distinct prefix so same-mix variants are never byte-identical
    # (the relay memoizes identical executions)
    load(0)
    emit()
    while len(ops) < BUCKET - 24:
        if mix == "nop":
            ops.append((de.NOP, 0, spec()))
        elif mix == "load_alu":
            load(0)
            alu_src(de.M_AND, 0, 0, de.B_BANK, N_ROWS)
            alu_src(de.M_AND, 0, 0, de.B_BANK, N_ROWS)
            emit()
        elif mix == "load_dyn":
            load(0, de.B_DYN, N_DYN)
            alu_src(de.M_OR, 0, 0, de.B_DYN, N_DYN)
            emit()
        elif mix == "th":
            # 2-of-3 counter circuit, planes in r0..r1, carries r2/r3
            load(0, de.B_ZERO, 1)
            load(1, de.B_ZERO, 1)
            for _ in range(3):
                load(2)
                cur, nxt = 2, 3
                for p in (0, 1):
                    alu(de.M_AND, nxt, p, cur)
                    alu(de.M_XOR, p, p, cur)
                    cur, nxt = nxt, cur
            load(2, de.B_FULL, 1)
            load(3, de.B_ZERO, 1)
            alu(de.M_AND, 2, 2, 1)       # k=2 -> bit1=1: eq &= p1
            alu(de.M_AND, 4, 2, 0)       # bit0=0: tmp = eq & p0
            alu(de.M_OR, 3, 3, 4)
            alu(de.M_ANDN, 2, 2, 0)
            alu(de.M_OR, 0, 3, 2)
            emit()
        else:
            raise SystemExit(f"unknown mix {mix}")
    return de.pack_code_array(BUCKET, [o[0] for o in ops],
                              [o[1] for o in ops], [o[2] for o in ops])


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(1)
    # flat global word axis: N_PART partitions x N_WORDS words per partition
    pw = N_PART * N_WORDS
    bank = jnp.asarray(
        rng.integers(0, 2**32, size=(N_ROWS, pw), dtype=np.uint64)
        .astype(np.uint32)
    )
    dyn = jnp.asarray(
        rng.integers(0, 2**32, size=(N_DYN, pw), dtype=np.uint64)
        .astype(np.uint32)
    )
    sparse = jnp.zeros((1, pw), jnp.uint32)
    full = jnp.full(pw, 0xFFFFFFFF, jnp.uint32)
    if os.environ.get("SILO_VM_KERNEL"):
        from lapis_silo_tpu.ops import pallas_kernels as pk

        @jax.jit
        def run(code, bank, dyn, sparse, full, n_instr):
            _words, counts = pk.vm_run(
                code[0], code[1],
                n_instr.reshape(1), bank, dyn, sparse, full, n_regs=N_REGS)
            return counts
    else:
        # _interpreter executables now take ONE packed blob (code 3xL +
        # trailing n_instr) — adapt the probe's (code, n_instr) call form
        inner = de._interpreter(BUCKET, N_ROWS, N_DYN, 0, pw, "multi_count",
                                n_regs=N_REGS)

        def run(code, bank, dyn, sparse, full, n_instr):
            blob = jnp.concatenate([code.reshape(-1),
                                    n_instr.reshape(1).astype(code.dtype)])
            return inner(blob, bank, dyn, sparse, full)
    # the relay memoizes byte-identical executions AND block_until_ready
    # does not block through it: every timed call uses a distinct code
    # variant and materializes the result with np.asarray
    REPS = 4
    codes = {mix: [jnp.asarray(build_code(mix, seed))
                   for seed in range(REPS + 1)]
             for mix in ("nop", "load_alu", "load_dyn", "th")}
    t0 = time.time()
    np.asarray(run(codes["nop"][0], bank, dyn, sparse, full, jnp.int32(4)))
    print(f"compile: {time.time() - t0:.1f}s", file=sys.stderr)

    lens = (64, 512, 2048, 4096)
    for mix, variants in codes.items():
        times = []
        for n in lens:
            # warm this n once (no recompile: n_instr is traced)
            np.asarray(run(variants[-1], bank, dyn, sparse, full, jnp.int32(n)))
            t0 = time.perf_counter()
            for r in range(REPS):
                np.asarray(run(variants[r], bank, dyn, sparse, full,
                               jnp.int32(n)))
            times.append((time.perf_counter() - t0) / REPS)
        slope_us = (times[-1] - times[0]) / (lens[-1] - lens[0]) * 1e6
        detail = "  ".join(f"{n}:{t*1e3:.1f}ms" for n, t in zip(lens, times))
        print(f"{mix:9s} {detail}  slope={slope_us:.2f} us/instr", flush=True)


if __name__ == "__main__":
    main()
