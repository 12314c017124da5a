"""On-chip parity check for the Mosaic filter-VM kernel.

Runs pallas_kernels.vm_run on the live TPU over a random program that
exercises every b-source, every ALU mode, EMIT_COUNT, and the padded NOP
tail, and compares words+counts against a pure-numpy emulation of the VM
semantics (the same semantics tests/test_pallas_kernels.py pins against
the XLA interpreter in interpret mode).

Usage: python scripts/vm_kernel_parity.py [pw_hi_blocks]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from lapis_silo_tpu.ops import device_engine as de  # noqa: E402
from lapis_silo_tpu.ops import pallas_kernels as pk  # noqa: E402


def numpy_vm(code, n_instr, bank, dyn, sparse, full, n_regs):
    n_rows, pw = bank.shape
    regs = np.zeros((n_regs + 1, pw), dtype=np.uint32)
    counts = np.zeros(pk.VM_MAX_BATCH, dtype=np.int64)
    for i in range(n_instr):
        op, operand, spec = int(code[0, i]), int(code[1, i]), int(code[2, i])
        dst = spec & 0xFF
        ra = (spec >> 8) & 0xFF
        rb = (spec >> 16) & 0xFF
        mode = (spec >> 24) & 0xF
        bsrc = (spec >> 28) & 0xF
        a = regs[min(ra, n_regs - 1)]
        if bsrc == de.B_REG:
            b = regs[min(rb, n_regs - 1)]
        elif bsrc == de.B_BANK:
            b = bank[min(max(operand, 0), n_rows - 1)]
        elif bsrc == de.B_DYN:
            b = dyn[min(max(operand, 0), dyn.shape[0] - 1)]
        elif bsrc == de.B_SPARSE:
            b = sparse[min(max(operand, 0), sparse.shape[0] - 1)]
        elif bsrc == de.B_FULL:
            b = full
        else:
            b = np.zeros_like(full)
        if mode == de.M_MOVB:
            val = b
        elif mode == de.M_AND:
            val = a & b
        elif mode == de.M_OR:
            val = a | b
        elif mode == de.M_XOR:
            val = a ^ b
        else:
            val = a & (b ^ full)
        if op == de.EMIT_COUNT:
            oi = min(operand, pk.VM_MAX_BATCH - 1)
            counts[oi] += int(
                np.unpackbits(a.view(np.uint8)).sum())
        regs[min(dst, n_regs)] = val
    return regs[0], counts.astype(np.int32)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    n_hi = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    pw = n_hi * 128
    n_rows, n_dyn, n_k, n_regs = 24, 3, 5, 8
    bucket = 64
    rng = np.random.default_rng(7)
    bank = rng.integers(0, 1 << 32, size=(n_rows, pw), dtype=np.uint32)
    dyn = rng.integers(0, 1 << 32, size=(n_dyn, pw), dtype=np.uint32)
    sparse = rng.integers(0, 1 << 32, size=(n_k, pw), dtype=np.uint32)
    full = np.full(pw, 0xFFFFFFFF, dtype=np.uint32)
    full[-40:] = 0x7

    code = np.zeros((3, bucket), dtype=np.int32)
    code[0, :] = de.NOP
    code[2, :] = de.NO_DST
    n = 0

    def emit(op, operand, dst, ra=0, rb=0, mode=0, bsrc=de.B_REG):
        nonlocal n
        code[0, n] = op
        code[1, n] = operand
        code[2, n] = dst | (ra << 8) | (rb << 16) | (mode << 24) | (bsrc << 28)
        n += 1

    qi = 0
    for _ in range(14):
        bsrc = int(rng.integers(0, 6))
        hi = {de.B_BANK: n_rows, de.B_DYN: n_dyn, de.B_SPARSE: n_k}.get(bsrc, 1)
        emit(de.ALU, int(rng.integers(0, hi)), int(rng.integers(0, n_regs)),
             int(rng.integers(0, n_regs)), int(rng.integers(0, n_regs)),
             int(rng.integers(0, 5)), bsrc)
        if rng.random() < 0.4:
            emit(de.EMIT_COUNT, qi, de.NO_DST,
                 ra=int(rng.integers(0, n_regs)))
            qi += 1
    n_exec = de._round_instr(n)

    want_words, want_counts = numpy_vm(code, n_exec, bank, dyn, sparse,
                                       full, n_regs)

    t0 = time.time()
    got_words, got_counts = pk.vm_run(
        jnp.asarray(code[1]), jnp.asarray(de.pack_wire(code[0], code[2])),
        jnp.asarray([n_exec], dtype=np.int32),
        jnp.asarray(bank), jnp.asarray(dyn), jnp.asarray(sparse),
        jnp.asarray(full), n_regs=n_regs)
    got_words = np.asarray(got_words)
    got_counts = np.asarray(got_counts)
    print(f"kernel compile+run: {time.time() - t0:.1f}s", file=sys.stderr)

    np.testing.assert_array_equal(got_words, want_words)
    np.testing.assert_array_equal(got_counts[:qi], want_counts[:qi])
    print(f"PARITY OK pw={pw} n_instr={n_exec} queries={qi} "
          f"count0={got_counts[0]}")


if __name__ == "__main__":
    main()
