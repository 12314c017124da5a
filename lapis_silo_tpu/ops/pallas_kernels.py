"""Pallas TPU kernels for the HBM-bandwidth-bound hot loops.

Production kernels:
- mutation_counts_banked — the Mutations reduction: for every (symbol,
  position) row of the dense plane bank, popcount(row & filter). ~1 op/byte
  arithmetic intensity, measured DMA-bound at ~91% of v5e HBM peak.
- sparse_filter_popcount — per-entry filter lookup over the sparse-tier CSR
  stream via Mosaic's per-lane dynamic_gather (XLA's generic gather costs a
  flat ~9 ns/element).

popcount_rows_and_filter + pad_to_blocks are a minimal single-filter
REFERENCE implementation kept as the simplest correctness oracle (no
production callers).

Falls back to the XLA path (ops/device_engine._mutation_counts_jit) when
Pallas is unavailable for the platform.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def interpret_default() -> bool:
    """SILO_PALLAS_INTERPRET=1 flips every kernel entry point to pallas
    interpret mode (pure-JAX emulation): CPU test meshes can then exercise
    the exact kernel code paths the TPU runs — including vm_run_sharded
    under shard_map — without hardware."""
    return os.environ.get("SILO_PALLAS_INTERPRET") == "1"

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # noqa: BLE001
    HAVE_PALLAS = False

ROW_BLOCK = 256
WORD_BLOCK = 2048

# Harley-Seal carry-save-adder popcount: the naive form spends ~10 VPU ops
# per word inside population_count; the CSA tree compresses 16 words into
# one "sixteens" word (15 full adders = 75 ops per 16 words) and popcounts
# ONLY that one, cutting steady-state cost to ~6.5 ops/word (the classic
# AVX2 positional-popcount trick, applied to [8,128] vregs). Requires the
# word block to split into 16 lane-aligned chunks.
_CSA_GROUP = 16


def _csa(a, b, c):
    """Full adder over bit-planes: returns (sum, carry)."""
    t = a ^ b
    return t ^ c, (a & b) | (t & c)


def _harley_seal_16(chunks, ones, twos, fours, eights):
    """Compress 16 equal-shape u32 planes into the running CSA accumulators;
    returns (ones, twos, fours, eights, sixteens)."""
    d = chunks
    ones, t_a = _csa(d[0], d[1], ones)
    ones, t_b = _csa(d[2], d[3], ones)
    twos, f_a = _csa(t_a, t_b, twos)
    ones, t_a = _csa(d[4], d[5], ones)
    ones, t_b = _csa(d[6], d[7], ones)
    twos, f_b = _csa(t_a, t_b, twos)
    fours, e_a = _csa(f_a, f_b, fours)
    ones, t_a = _csa(d[8], d[9], ones)
    ones, t_b = _csa(d[10], d[11], ones)
    twos, f_a = _csa(t_a, t_b, twos)
    ones, t_a = _csa(d[12], d[13], ones)
    ones, t_b = _csa(d[14], d[15], ones)
    twos, f_b = _csa(t_a, t_b, twos)
    fours, e_b = _csa(f_a, f_b, fours)
    eights, sixteens = _csa(e_a, e_b, eights)
    return ones, twos, fours, eights, sixteens


def _popc(x):
    return jax.lax.population_count(x).astype(jnp.int32)


def _popcount_rows_kernel(filter_ref, rows_ref, out_ref):
    """rows_ref [BR, BW] u32, filter_ref [1, BW] u32 -> out_ref [BR, 1] i32,
    accumulated over the word-block grid axis."""
    masked = rows_ref[:] & filter_ref[:]
    counts = jnp.sum(
        jax.lax.population_count(masked).astype(jnp.int32), axis=1, keepdims=True
    )

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += counts


@functools.partial(jax.jit, static_argnums=(2,))
def popcount_rows_and_filter(rows, filter_words, interpret=None):
    """counts[i] = popcount(rows[i] & filter) for a [R, W] u32 row bank.

    R and W must be padded to ROW_BLOCK / WORD_BLOCK multiples by the caller
    (zero padding is exact: zero words contribute nothing).
    """
    if interpret is None:
        interpret = interpret_default()
    n_rows, n_words = rows.shape
    assert n_rows % ROW_BLOCK == 0 and n_words % WORD_BLOCK == 0, (rows.shape,)
    grid = (n_rows // ROW_BLOCK, n_words // WORD_BLOCK)
    out = pl.pallas_call(
        _popcount_rows_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, WORD_BLOCK), lambda i, j: (0, j)),
            pl.BlockSpec((ROW_BLOCK, WORD_BLOCK), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, 1), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_rows, 1), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rows * n_words,
            bytes_accessed=n_rows * n_words * 4,
            transcendentals=0,
        ),
    )(filter_words.reshape(1, n_words), rows)
    return out[:, 0]


# Segment-row buckets: mutation_counts_banked pads SMALL segments' row
# counts up to a power-of-two bucket so a corpus's ~25 gene segments share
# a couple of executables instead of compiling one each (remote TPU
# compiles run minutes apiece; `start` rides in as a prefetched scalar so
# the offset never forces a shape). Large segments (the main nucleotide
# plane — one per corpus) stay exact: padding them would add up to 2x DMA
# on the dominant reduction.
SEG_ROW_BUCKETS = tuple(ROW_BLOCK * (1 << s) for s in range(5))  # <= 4096


def seg_row_bucket(n_rows: int) -> int:
    return next((b for b in SEG_ROW_BUCKETS if b >= n_rows),
                -(-n_rows // ROW_BLOCK) * ROW_BLOCK)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def mutation_counts_banked(bank, filters, start, n_seg_rows: int, n_words: int,
                           row_block: int = ROW_BLOCK, word_block: int | None = None,
                           use_csa: bool | None = None,
                           interpret: bool | None = None):
    """counts[n_seg_rows]: popcount(bank_row & filter) over the GLOBAL word
    axis (partitions folded into words — the per-partition sums of the
    reference's mutations.cpp arrive pre-merged).

    bank [R, PW] stays in HBM; the kernel streams row_block x word_block
    tiles through VMEM against the flat filter. `start` (dynamic, prefetched
    scalar — one executable serves every segment offset) must be
    row_block-aligned (DeviceEngine aligns segment offsets), PW must be a
    lane multiple; callers bucket n_seg_rows (seg_row_bucket) and slice the
    result. Row blocks past the bank's end clamp to the last block (their
    counts land in sliced-off output rows). `use_csa=True` selects the
    Harley-Seal CSA popcount (see _harley_seal_16) — measured on v5e the
    naive form already runs DMA-bound at ~91% of HBM peak (747 GB/s) and
    CSA is marginally slower (722 GB/s, scratch traffic with no VPU
    bottleneck to relieve), so the default is the naive form; CSA stays for
    A/B on future hardware where the VPU/HBM ratio differs.
    """
    if interpret is None:
        interpret = interpret_default()
    start_block = jnp.asarray(start, jnp.int32).reshape(1) // row_block
    max_block = max(bank.shape[0] // row_block - 1, 0)
    assert n_seg_rows % row_block == 0
    if bank.ndim == 3:
        # Bank at rest in the VM kernel's shape [R, PW/128, 128] (see
        # vm_run): stream (row_block, w_blk, 128) tiles. Reshaping it to
        # 2-D would materialize a full relayout copy of the bank in HBM.
        assert bank.shape[1] * 128 == n_words and bank.shape[2] == 128
        assert not use_csa
        n_hi = bank.shape[1]
        w_blk = next(
            b for b in range(min(WORD_BLOCK // 128, n_hi), 0, -1)
            if n_hi % b == 0
        )
        n_j3 = n_hi // w_blk
        grid3 = (n_seg_rows // row_block, n_j3)

        def kernel3(start_ref, filter_ref, rows_ref, out_ref):
            del start_ref  # consumed by the index maps
            masked = rows_ref[:] & filter_ref[:]
            counts = jnp.sum(jnp.sum(_popc(masked), axis=2), axis=1,
                             keepdims=True)

            @pl.when(pl.program_id(1) == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            out_ref[:] += counts

        try:
            params3 = pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"))
        except Exception:  # noqa: BLE001
            params3 = None
        grid_spec3 = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid3,
            in_specs=[
                pl.BlockSpec((1, w_blk, 128), lambda i, j, s: (0, j, 0)),
                pl.BlockSpec(
                    (row_block, w_blk, 128),
                    lambda i, j, s: (jnp.minimum(s[0] + i, max_block), j, 0),
                ),
            ],
            out_specs=pl.BlockSpec((row_block, 1), lambda i, j, s: (i, 0)),
        )
        out = pl.pallas_call(
            kernel3,
            grid_spec=grid_spec3,
            out_shape=jax.ShapeDtypeStruct((n_seg_rows, 1), jnp.int32),
            compiler_params=params3,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * n_seg_rows * n_words,
                bytes_accessed=n_seg_rows * n_words * 4,
                transcendentals=0,
            ),
        )(start_block, filters.reshape(1, n_hi, 128), bank)
        return out[:, 0]
    if word_block is None:
        # largest lane-aligned block <= WORD_BLOCK that divides n_words
        # exactly — a floor grid would silently drop trailing words (and
        # sequences), and Mosaic requires 128-lane multiples
        word_block = next(
            b for b in range(min(WORD_BLOCK, n_words), 0, -128)
            if b % 128 == 0 and n_words % b == 0
        )
    assert n_words % word_block == 0 and word_block % 128 == 0, (n_words, word_block)
    if use_csa is None:
        use_csa = False
    assert not use_csa or word_block % (_CSA_GROUP * 128) == 0, word_block
    # word-block reduction axis innermost so each output block's revisits
    # are consecutive
    n_j = n_words // word_block
    grid = (n_seg_rows // row_block, n_j)
    chunk = word_block // _CSA_GROUP

    def kernel_naive(start_ref, filter_ref, rows_ref, out_ref):
        del start_ref  # consumed by the index maps
        masked = rows_ref[:] & filter_ref[:]
        counts = jnp.sum(_popc(masked), axis=1, keepdims=True)

        @pl.when(pl.program_id(1) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += counts

    def kernel_csa(start_ref, filter_ref, rows_ref, out_ref,
                   ones_ref, twos_ref, fours_ref, eights_ref, acc_ref):
        del start_ref  # consumed by the index maps
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            ones_ref[:] = jnp.zeros_like(ones_ref)
            twos_ref[:] = jnp.zeros_like(twos_ref)
            fours_ref[:] = jnp.zeros_like(fours_ref)
            eights_ref[:] = jnp.zeros_like(eights_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        masked = rows_ref[:] & filter_ref[:]
        chunks = [masked[:, k * chunk:(k + 1) * chunk] for k in range(_CSA_GROUP)]
        ones, twos, fours, eights, sixteens = _harley_seal_16(
            chunks, ones_ref[:], twos_ref[:], fours_ref[:], eights_ref[:]
        )
        ones_ref[:], twos_ref[:] = ones, twos
        fours_ref[:], eights_ref[:] = fours, eights
        acc_ref[:] += _popc(sixteens)

        @pl.when(j == n_j - 1)
        def _():
            total = (
                16 * acc_ref[:]
                + 8 * _popc(eights_ref[:])
                + 4 * _popc(fours_ref[:])
                + 2 * _popc(twos_ref[:])
                + _popc(ones_ref[:])
            )
            out_ref[:] = jnp.sum(total, axis=1, keepdims=True)

    try:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))
    except Exception:  # noqa: BLE001
        compiler_params = None
    scratch_shapes = (
        [pltpu.VMEM((row_block, chunk), jnp.uint32) for _ in range(4)]
        + [pltpu.VMEM((row_block, chunk), jnp.int32)]
    ) if use_csa else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, word_block), lambda i, j, s: (0, j)),
            pl.BlockSpec(
                (row_block, word_block),
                lambda i, j, s: (jnp.minimum(s[0] + i, max_block), j),
            ),
        ],
        out_specs=pl.BlockSpec((row_block, 1), lambda i, j, s: (i, 0)),
        scratch_shapes=scratch_shapes,
    )
    out = pl.pallas_call(
        kernel_csa if use_csa else kernel_naive,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_seg_rows, 1), jnp.int32),
        compiler_params=compiler_params,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_seg_rows * n_words,
            bytes_accessed=n_seg_rows * n_words * 4,
            transcendentals=0,
        ),
    )(start_block, filters.reshape(1, n_words), bank)
    return out[:, 0]


# Sparse-stream gather kernel: XLA's generic gather runs at ~9 ns/element
# on TPU (measured: 313 ms for 32M lookups from a 128 KB table — latency-
# bound scalar loop, unaffected by sortedness or bounds mode). This kernel
# replaces it with Mosaic's per-lane `tpu.dynamic_gather` (exposed through
# take_along_axis when indices.shape == operand.shape): the whole GLOBAL
# filter lives in VMEM as [PW/128, 128] rows; a fori_loop walks filter rows,
# each step doing ONE 128-way lane gather + select per vreg. The stream is
# sorted (leaf-major, partition, word), so a small slab of consecutive
# entries only spans a NARROW band of filter rows. Each [8, 128] GROUP
# (1024 entries) computes its own (min, max) hi bounds IN-KERNEL from the
# idx data already in VMEM and walks just that band — the walk is
# proportional to the rows each slab actually touches. (The first version
# used per-16384-entry-chunk bounds prefetched from SMEM: chunk spans are
# ~16-80 rows where group spans are 1-2, and the bounds array overflowed
# SMEM at per-group granularity; computing them in-kernel costs two vreg
# reductions and removes the input entirely. Measured on v5e: 30M entries
# in ~35 ms total = ~0.23 ns/entry marginal, ~8x the chunk-bounds form.)
SPARSE_CHUNK = 16384
SPARSE_GROUP = 1024  # one [8, 128] slab


def _sparse_vals_kernel(filt_ref, comb_ref, out_ref):
    def per_group(g, _):
        # block-interleaved combined stream: group g's 8 idx rows at
        # g*COMBINE_GROUP_ROWS, word rows COMBINE_WORD_ROW_OFF later
        # (indices stored as u32, bit-identical i32)
        base = g * COMBINE_GROUP_ROWS
        idx = comb_ref[pl.ds(base, 8), :].astype(jnp.int32)
        words = comb_ref[pl.ds(base + COMBINE_WORD_ROW_OFF, 8), :]
        lo = idx & 127
        hi = idx >> 7
        h0 = jnp.min(hi)
        h1 = jnp.max(hi)

        def body(h, val):
            row = filt_ref[h, :]
            row_b = jnp.broadcast_to(row[None, :], idx.shape)
            gth = jnp.take_along_axis(row_b, lo, axis=1)
            return jnp.where(hi == h, gth, val)

        val = jax.lax.fori_loop(h0, h1 + 1, body, jnp.zeros_like(words))
        out_ref[pl.ds(g * 8, 8), :] = jax.lax.population_count(
            words & val).astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, SPARSE_CHUNK // SPARSE_GROUP, per_group, 0)


COMBINE_BLOCK = 1024  # entries per interleaved (8 idx + 8 word row) group
COMBINE_GROUP_ROWS = 16   # buffer rows per COMBINE_BLOCK entries (8 idx + 8 word)
COMBINE_WORD_ROW_OFF = 8  # a position's word row = its idx row + this


def comb_idx_row(p):
    """Idx row of stream entry position p in the block-interleaved combined
    stream (combine_stream layout). The word row is
    `comb_idx_row(p) + COMBINE_WORD_ROW_OFF`, the lane is `p & 127`. THE
    single definition of the interleave address arithmetic — vm._densify_one,
    the densify kernels, and reductions' de-interleave all route through
    here (or split_stream below), so a layout change cannot silently
    diverge. Works on python ints, numpy arrays, and traced jax values."""
    return ((p >> 10) * COMBINE_GROUP_ROWS) + ((p >> 7) & 7)


def comb_group_row(p):
    """First buffer row of the COMBINE_BLOCK-entry group containing
    position p (the 16-row-aligned DMA window base)."""
    return (p >> 10) * COMBINE_GROUP_ROWS


def split_stream(comb):
    """Inverse of combine_stream: (idx int32 [E], words u32 [E]) from the
    combined [2E/128, 128] array (numpy or jnp)."""
    v = comb.reshape(-1, 2, COMBINE_WORD_ROW_OFF, 128)
    if isinstance(comb, np.ndarray):
        return (v[:, 0].reshape(-1).view(np.int32).copy(),
                v[:, 1].reshape(-1))
    return (v[:, 0].reshape(-1).astype(jnp.int32),
            v[:, 1].reshape(-1))


def combine_stream(sp_idx, sp_words):
    """Pack the sparse-tier CSR stream into ONE [2E/128, 128] u32 array,
    8-row block-interleaved: each 1024-entry group stores its 8 idx rows
    (bit-identical i32->u32) followed by its 8 word rows. Every kernel
    window then moves with a SINGLE DMA (idx + words were two issues/
    waits per densify segment — serial scalar work that bounds cold
    sweeps at ~100-entry segments), and every in-kernel load stays the
    proven lane-offset-0 pattern (a [*, 256] lanes-split layout hit TWO
    Mosaic hardware limitations: dynamic-sublane loads at lane offset
    128, and broadcasts of lane-offset vreg slices). Entry position p
    maps to idx row (p>>10)*16 + ((p>>7)&7), word row = idx row + 8,
    lane p&127. Works on numpy (engine init) and jnp (tests) inputs;
    E must be a multiple of COMBINE_BLOCK."""
    e = sp_idx.shape[0]
    assert e % COMBINE_BLOCK == 0, e
    if isinstance(sp_idx, np.ndarray):
        comb = np.empty((e // 64, 128), np.uint32)
        v = comb.reshape(e // COMBINE_BLOCK, 2, 8, 128)
        v[:, 0] = sp_idx.reshape(-1, 8, 128).view(np.uint32)
        v[:, 1] = sp_words.reshape(-1, 8, 128)
        return comb
    return jnp.concatenate(
        [sp_idx.reshape(-1, 1, 8, 128).astype(jnp.uint32),
         sp_words.reshape(-1, 1, 8, 128)], axis=1).reshape(-1, 128)


def sparse_filter_popcount(filters, stream_comb, interpret=None):
    """vals[E] i32 = popcount(word & filters[idx]) over the combined
    [E/128, 256] stream (combine_stream) — the per-entry reduction of the
    GLOBAL sparse-tier CSR stream against the flat filter (reference
    mutations.cpp's and_cardinality over sparse rows). E must be a
    SPARSE_CHUNK multiple and PW a lane multiple; pad entries carry word 0
    and contribute 0."""
    if interpret is None:
        interpret = interpret_default()

    n_words = filters.shape[0]
    e = stream_comb.shape[0] * 64
    assert stream_comb.shape[1] == 128, stream_comb.shape
    assert e % SPARSE_CHUNK == 0 and n_words % 128 == 0, (e, n_words)
    n_hi = n_words // 128
    rows_per_chunk = SPARSE_CHUNK // 64   # interleaved rows per chunk
    n_chunks = e // SPARSE_CHUNK
    out = pl.pallas_call(
        _sparse_vals_kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((n_hi, 128), lambda c: (0, 0)),
            pl.BlockSpec((rows_per_chunk, 128), lambda c: (c, 0)),
        ],
        out_specs=pl.BlockSpec((SPARSE_CHUNK // 128, 128),
                               lambda c: (c, 0)),
        out_shape=jax.ShapeDtypeStruct((e // 128, 128), jnp.int32),
        interpret=interpret,
    )(filters.reshape(-1, 128), stream_comb)
    return out.reshape(e)


def pad_to_blocks(rows: np.ndarray) -> np.ndarray:
    r, w = rows.shape
    rp = -(-r // ROW_BLOCK) * ROW_BLOCK
    wp = -(-w // WORD_BLOCK) * WORD_BLOCK
    if (rp, wp) == (r, w):
        return rows
    out = np.zeros((rp, wp), dtype=np.uint32)
    out[:r, :w] = rows
    return out


# ---------------------------------------------------------------------------
# The filter-VM kernel: the register machine's inner loop as a Mosaic
# kernel. The XLA while_loop interpreter pays ~0.3 us per 1K flat words per
# instruction of pure overhead (opcode-independent — ~13 row-passes of HBM
# traffic through the carried register file; measured 95 us/instr at 327680
# flat words). Here the register file lives in VMEM for the whole program,
# so per-instruction HBM traffic is exactly ONE row DMA (the instruction's
# b-source), the speed-of-light for a program that streams index rows.
#
# Layout contract (matches DeviceEngine's global word space):
#   bank [R, PW], dyn [n_dyn, PW], sparse_rows [K, PW], full [PW], words
#   viewed as [PW/128, 128] inside the kernel. The word axis splits into
#   grid blocks when the register file would overflow VMEM; instruction
#   decode re-runs per block (SMEM scalars — free next to the row DMA).
# ---------------------------------------------------------------------------

VM_MAX_BATCH = 4096  # must match device_engine.MAX_BATCH_QUERIES
_ANY = getattr(pl, "ANY", None) or (pltpu.ANY if HAVE_PALLAS else None)


def get_shard_map():
    """shard_map with the replication/vma check off (pallas_call out_shapes
    carry no varying-mesh-axes annotation; the flag name differs across jax
    versions). The single shim for every sharded kernel wrapper."""
    if hasattr(jax, "shard_map"):
        return functools.partial(jax.shard_map, check_vma=False)
    from jax.experimental.shard_map import shard_map as _sm

    return functools.partial(_sm, check_rep=False)


def _vm_block_hi(n_hi: int, n_regs: int, vmem_cap_bytes: int = 64 << 20):
    """Largest per-block hi-row count (multiple of the whole-words-per-
    partition quantum that divides n_hi) whose register file fits VMEM;
    None when even one quantum overflows (callers fall back to XLA)."""
    per_hi = (n_regs + 5) * 128 * 4  # regs+trash, 2 slots, full, words out
    cap = max(vmem_cap_bytes // per_hi, 0)
    if cap >= n_hi:
        return n_hi
    for div in range(cap, 0, -1):
        if n_hi % div == 0:
            return div
    return None


def vm_run(opers, specs, n_instr, bank, dyn, sparse_rows, full,
           n_regs: int, interpret: bool | None = None,
           vmem_cap_bytes: int = 64 << 20):
    """Execute a register-machine program (see device_engine opcodes) over
    flat global words. Returns (words [PW] u32 = reg[0], counts
    [VM_MAX_BATCH] i32 from EMIT_COUNT instructions).

    opers/specs: int32[L] instruction stream in the WIRE format (vm.py
    pack_wire: operand + packed dst/ra/rb/mode/bsrc/opcode word),
    scalar-prefetched to SMEM; n_instr: int32[1] actual instruction count
    (the padded NOP tail is never executed — one executable serves every
    program length in the bucket).

    The bank may arrive pre-shaped [R, PW/128, 128] (DeviceEngine stores it
    that way at rest): a 2-D [R, PW] bank is NOT bitcast-compatible with the
    kernel's 3-D view under TPU tiled layouts, so reshaping it here would
    materialize a full HBM copy of the bank INSIDE the executable (10.97 GB
    at 1M rows — an OOM, and a per-dispatch relayout)."""
    if interpret is None:
        interpret = interpret_default()
    if bank.ndim == 3:
        n_rows, bank_hi, lanes = bank.shape
        assert lanes == 128, bank.shape
        pw = bank_hi * 128
        bank3 = bank
    else:
        n_rows, pw = bank.shape
        assert pw % 128 == 0, pw
        bank3 = bank.reshape(n_rows, pw // 128, 128)
    n_dyn = dyn.shape[0]
    n_sparse_k = sparse_rows.shape[0]
    n_hi = pw // 128
    w_hi = _vm_block_hi(n_hi, n_regs, vmem_cap_bytes)
    assert w_hi is not None, (n_hi, n_regs)
    n_blocks = n_hi // w_hi

    dyn3 = dyn.reshape(n_dyn, n_hi, 128)
    # The leaf pool arrives pre-shaped 3-D for the same reason as the bank:
    # reshaping a resident [C, PW] array here would relayout-copy the whole
    # pool (1+ GB at 10M) inside every dispatch.
    if sparse_rows.ndim == 3:
        assert sparse_rows.shape[1:] == (n_hi, 128), sparse_rows.shape
        sparse3 = sparse_rows
    else:
        sparse3 = sparse_rows.reshape(n_sparse_k, n_hi, 128)
    full2 = full.reshape(n_hi, 128)

    # Double-buffered b-source prefetch: the instruction stream is static
    # (SMEM scalars), so instruction i+1's row DMA starts into the other
    # slot while instruction i computes — the serial start();wait() form
    # exposed the full HBM round-trip latency per instruction (~1.8 us of
    # the measured 4.1 us load+AND cost). SILO_VM_PREFETCH=0 restores the
    # serial schedule for A/B runs (same 2-slot layout, no early start).
    prefetch = os.environ.get("SILO_VM_PREFETCH", "1") != "0"

    def kernel(oper_ref, spec_ref, ninstr_ref,
               bank_ref, dyn_ref, sparse_ref, full_ref,
               words_ref, counts_ref, regs_ref, slot_ref, sem):
        b = pl.program_id(0)
        hi0 = b * w_hi
        n = ninstr_ref[0]

        @pl.when(b == 0)
        def _():
            def zero(i, _):
                counts_ref[i] = 0
                return 0
            jax.lax.fori_loop(0, VM_MAX_BATCH, zero, 0)

        regs_ref[...] = jnp.zeros_like(regs_ref)

        def each_dma(i, slot, action):
            """Run `action` on the async-copy descriptor moving instruction
            i's b-source row into `slot` — guarded per source kind, so
            starts and waits pair exactly (bsrc 0/4/5 issue no DMA)."""
            operand = oper_ref[i]
            bsrc = (spec_ref[i] >> 22) & 0xF  # WIRE_BSRC_SHIFT

            def mk(ref, hi):
                return pltpu.make_async_copy(
                    ref.at[jnp.clip(operand, 0, hi), pl.ds(hi0, w_hi), :],
                    slot_ref.at[slot], sem.at[slot])

            @pl.when(bsrc == 1)  # B_BANK
            def _():
                action(mk(bank_ref, n_rows - 1))

            @pl.when(bsrc == 2)  # B_DYN
            def _():
                action(mk(dyn_ref, n_dyn - 1))

            @pl.when(bsrc == 3)  # B_SPARSE
            def _():
                action(mk(sparse_ref, n_sparse_k - 1))

        if prefetch:
            @pl.when(n > 0)
            def _():
                each_dma(0, 0, lambda cp: cp.start())

        def body(i, _):
            cur = i & 1
            if prefetch:
                @pl.when(i + 1 < n)
                def _():
                    each_dma(i + 1, 1 - cur, lambda cp: cp.start())
            else:
                each_dma(i, cur, lambda cp: cp.start())
            each_dma(i, cur, lambda cp: cp.wait())

            operand = oper_ref[i]
            spec = spec_ref[i]
            # wire decode (vm.py pack_wire layout)
            dst = spec & 0x3F
            ra = (spec >> 6) & 0x3F
            rb = (spec >> 12) & 0x3F
            mode = (spec >> 18) & 0xF
            bsrc = (spec >> 22) & 0xF

            a = regs_ref[jnp.minimum(ra, n_regs - 1)]
            dstc = jnp.minimum(dst, n_regs)

            # mode/bsrc are SCALARS: branch (pl.when) instead of select
            # cascades. The branchless form paid ~11 VPU passes per
            # instruction (4 bsel selects + 4 mode selects + reads/write)
            # and was COMPUTE-bound at large word counts — 5.7 us/instr
            # measured at the 10M flat shape where the row DMA alone is
            # 1.8 us. Exactly one (bsrc, mode) block executes: ~3 passes.
            def write_mode(get_b):
                @pl.when(mode == 0)
                def _():
                    regs_ref[dstc] = get_b()

                @pl.when(mode == 1)
                def _():
                    regs_ref[dstc] = a & get_b()

                @pl.when(mode == 2)
                def _():
                    regs_ref[dstc] = a | get_b()

                @pl.when(mode == 3)
                def _():
                    regs_ref[dstc] = a ^ get_b()

                @pl.when(mode == 4)
                def _():
                    regs_ref[dstc] = a & (get_b() ^ full_ref[...])

            @pl.when((bsrc == 1) | (bsrc == 2) | (bsrc == 3))
            def _():  # DMA-backed sources land in the prefetch slot
                write_mode(lambda: slot_ref[cur])

            @pl.when(bsrc == 0)
            def _():
                write_mode(
                    lambda: regs_ref[jnp.minimum(rb, n_regs - 1)])

            @pl.when(bsrc == 4)
            def _():
                write_mode(lambda: full_ref[...])

            @pl.when(bsrc == 5)
            def _():
                write_mode(lambda: jnp.zeros_like(a))

            @pl.when(((spec >> 26) & 0x3) == 1)  # opcode EMIT_COUNT
            def _():
                s = jnp.sum(_popc(a), dtype=jnp.int32)
                oi = jnp.minimum(operand, VM_MAX_BATCH - 1)
                counts_ref[oi] = counts_ref[oi] + s

            return 0

        jax.lax.fori_loop(0, n, body, 0)
        words_ref[...] = regs_ref[0]

    try:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 << 20)
    except Exception:  # noqa: BLE001
        compiler_params = None
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=_ANY),
            pl.BlockSpec(memory_space=_ANY),
            pl.BlockSpec(memory_space=_ANY),
            pl.BlockSpec((w_hi, 128), lambda b, *s: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((w_hi, 128), lambda b, *s: (b, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_regs + 1, w_hi, 128), jnp.uint32),
            pltpu.VMEM((2, w_hi, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    words, counts = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_hi, 128), jnp.uint32),
            jax.ShapeDtypeStruct((VM_MAX_BATCH,), jnp.int32),
        ),
        compiler_params=compiler_params,
        interpret=interpret,
    )(opers, specs, n_instr, bank3, dyn3, sparse3, full2)
    return words.reshape(pw), counts


def vm_run_sharded(mesh, axis: str, opers, specs, n_instr, bank, dyn,
                   sparse_rows, full, n_regs: int,
                   interpret: bool | None = None):
    """vm_run over a word-sharded Mesh: each device runs the Mosaic kernel
    on its LOCAL word shard (the VM is word-local, so no communication
    until the end), EMIT_COUNT outputs merge with one psum over ICI.

    Expects the flat global word axis sharded over `axis`:
    bank [R, PW/128, 128] with the hi axis sharded, dyn [n_dyn, PW] /
    sparse_rows [K, PW] / full [PW] word-sharded. The local shard must keep
    whole 128-lane rows (DeviceEngine pads n_words so PW % (128 * n_devices)
    == 0). Without this wrapper a mesh engine falls back to the XLA
    while_loop VM (~13 register-file passes of HBM traffic per instruction
    instead of one row DMA)."""
    from jax.sharding import PartitionSpec as P

    shard_map = get_shard_map()

    def local(opers_l, specs_l, ninstr_l, bank_l, dyn_l, sp_l, full_l):
        words, counts = vm_run(opers_l, specs_l, ninstr_l, bank_l,
                               dyn_l, sp_l, full_l, n_regs=n_regs,
                               interpret=interpret)
        return words, jax.lax.psum(counts, axis)

    # sparse_rows is either the per-dispatch densified [K, PW] block or the
    # resident 3-D hot-leaf pool [C+1, PW/128, 128] — both word-sharded
    sparse_spec = (P(None, axis, None) if sparse_rows.ndim == 3
                   else P(None, axis))
    return shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(None, axis, None), P(None, axis),
                  sparse_spec, P(axis)),
        out_specs=(P(axis), P()),
    )(opers, specs, n_instr, bank, dyn, sparse_rows, full)


def mutation_counts_banked_sharded(mesh, axis: str, bank3, filters, start,
                                   n_seg_rows: int, n_words: int,
                                   interpret: bool | None = None):
    """mutation_counts_banked over a word-sharded Mesh: each device reduces
    its local word shard of every segment row, per-row counts psum-merge
    over ICI. bank3 [R, PW/128, 128] with the hi axis sharded; filters [PW]
    word-sharded."""
    from jax.sharding import PartitionSpec as P

    shard_map = get_shard_map()
    n_words_local = n_words // mesh.devices.size

    def local(bank_l, filters_l):
        counts = mutation_counts_banked(bank_l, filters_l, start, n_seg_rows,
                                        n_words_local, interpret=interpret)
        return jax.lax.psum(counts, axis)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None), P(axis)),
        out_specs=P(),
    )(bank3, filters)


# ---------------------------------------------------------------------------
# Sparse-leaf densify: build [K, PW] dense rows from the partition-major CSR
# stream. XLA's gather+scatter formulation is TRANSACTION-bound at ~100 ns
# per E-budget SLOT (measured at the 10M sub-dispatch shape: 3 gathers + 1
# scatter per slot, cost scaling with the padded budget). This kernel builds
# each leaf row in VMEM — one masked 128-lane RMW per LIVE entry (~18
# ns/entry measured, 6x) — and never materializes slot indirection at all.
# ---------------------------------------------------------------------------

PREFETCH_SLOTS = 4         # cross-segment window pipeline depth (pow2):
                           # segment processing (~0.5 us) is shorter than
                           # the window-DMA latency, so depth 2 exposed
                           # most of the latency per segment
DENSIFY_CHUNK = 1024       # entries consumed per DMA window
DENSIFY_WINDOW = 2048      # aligned window (16 rows x 128) covering any
                           # 1024-aligned offset + CHUNK entries
MXU_SPAN = 128             # hi rows per matmul-scatter output tile: a
                           # 128-entry window row whose sorted indices span
                           # <= 128*128 words scatters via one-hot matmuls
                           # instead of 128 serial RMWs. 128 covers a WHOLE
                           # <=16,384-word partition window (10M x 32:
                           # 10,240 words = 80 hi), so every in-partition
                           # segment takes the MXU path


def bounded_part_h0(n_per_leaf: int, n_words: int):
    """Per-partition 8-aligned MXU tile base rows for the BOUNDED densify
    path: valid when the engine's uniform layout (partition pi owns global
    words [pi*W, (pi+1)*W), W = n_words // n_per_leaf) guarantees every
    segment's index span fits one [MXU_SPAN, 128] output tile. Returns an
    i32 [n_per_leaf] array of h0 rows, or None when any window could
    overflow the tile (callers then use the span-checked kernel)."""
    if n_words % 128 or n_per_leaf <= 0 or n_words % n_per_leaf:
        return None
    hi = n_words // 128
    if hi < MXU_SPAN:
        return None
    w = n_words // n_per_leaf
    out = np.empty(n_per_leaf, np.int32)
    for pi in range(n_per_leaf):
        s_hi = (pi * w) >> 7
        l_hi = ((pi + 1) * w - 1) >> 7
        h0 = min((s_hi >> 3) << 3, hi - MXU_SPAN)
        if l_hi - h0 >= MXU_SPAN:
            return None
        out[pi] = h0
    return out


def densify_rows(stream_comb, starts, lens, n_sparse_k: int,
                 n_words: int, interpret: bool | None = None,
                 part_h0=None):
    """[K, PW] u32: for each of n_sparse_k leaves, scatter its n_per_leaf
    contiguous (start, len) stream segments (seg = leaf * P + pi) into a
    dense global-word row. stream_comb is the COMBINED [E/128, 256] u32
    stream (combine_stream: idx lanes 0:128, word lanes 128:256) — one
    window DMA moves both halves. Stream entries within a segment carry
    GLOBAL word indices in that partition's disjoint window (so every
    target is written at most once). The stream must be padded so any
    aligned DENSIFY_WINDOW read past the last live entry stays in bounds
    (DeviceEngine pads by DENSIFY_WINDOW), with pad words 0.

    part_h0 (i32 [n_per_leaf], from bounded_part_h0) opts into the
    BOUNDED fast path: the caller guarantees segment pi's indices lie in
    [part_h0[pi]*128, (part_h0[pi]+MXU_SPAN)*128), so the kernel skips
    the SMEM window copy entirely and the two per-row scalar span reads —
    per-segment serial scalar work is the cold-sweep bound at ~100-entry
    segments."""
    if interpret is None:
        interpret = interpret_default()
    n_seg = starts.shape[0]
    n_per_leaf = n_seg // n_sparse_k
    assert n_seg == n_sparse_k * n_per_leaf
    assert stream_comb.ndim == 2 and stream_comb.shape[1] == 128, (
        stream_comb.shape)
    assert stream_comb.shape[0] % 16 == 0, stream_comb.shape
    assert n_words % 128 == 0, n_words
    hi = n_words // 128
    # MXU scatter path (see per_row below): needs >= MXU_SPAN hi rows to
    # slice a full [MXU_SPAN, 128] accumulation tile out of the output.
    # Bit-exact on hardware (and vs the numpy oracle in interpret mode);
    # measured through the production pool-update path at 10M x 32 it
    # cuts cold-sweep batches ~20% (609 vs 730 ms for a 2048-query batch
    # missing ~7.4k leaves). SILO_DENSIFY_MXU=0 restores the per-entry
    # RMW for A/B.
    use_mxu = (hi >= MXU_SPAN
               and os.environ.get("SILO_DENSIFY_MXU", "1") != "0")
    bounded = (use_mxu and part_h0 is not None
               and os.environ.get("SILO_DENSIFY_BOUNDED", "1") != "0")
    # bounded scatter tile: shrink from the fixed MXU_SPAN to the actual
    # maximum per-partition span (8-row rounded) — the [span, 128] output
    # RMW and the one-hot mask build scale with the tile height (80-hi
    # partition windows at 10M x 32 need an 88-row tile, not 128)
    span_rows = MXU_SPAN
    if bounded:
        w_part = n_words // n_per_leaf
        span_rows = 8
        for pi in range(n_per_leaf):
            l_hi = ((pi + 1) * w_part - 1) >> 7
            span_pi = l_hi - int(part_h0[pi]) + 1
            span_rows = max(span_rows, -(-span_pi // 8) * 8)
        assert span_rows <= MXU_SPAN, span_rows

    def kernel(*refs):
        if bounded:
            (starts_ref, lens_ref, h0_ref, comb_hbm, out_ref,
             comb_v, sem_v) = refs
            comb_s = sem_s = None
        elif use_mxu:
            (starts_ref, lens_ref, comb_hbm, out_ref,
             comb_s, comb_v, sem_s, sem_v) = refs
        else:
            (starts_ref, lens_ref, comb_hbm, out_ref,
             comb_s, sem_s) = refs
            comb_v = sem_v = None
        k = pl.program_id(0)
        out_ref[...] = jnp.zeros_like(out_ref)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        if use_mxu:
            # constants for the matmul-scatter: lane iota over a [128,128]
            # tile (entry-major) and a [MXU_SPAN,128] sublane iota
            iota_l_sq = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
            iota_s_span = jax.lax.broadcasted_iota(
                jnp.int32, (span_rows, 128), 0)
            # A/B knob: fold byte planes into the A operand (one
            # transpose instead of two per row) — see mxu_row_scatter
            aplanes = os.environ.get("SILO_DENSIFY_APLANES", "0") == "1"

        def window_copies(p0, slot):
            """The async copies moving the combined (idx + word) window
            covering stream position p0 into buffer `slot` — ONE copy per
            memory space. BOUNDED skips SMEM entirely (no scalar reads);
            the span-checked MXU path keeps an SMEM copy for its per-row
            span decisions and the per-entry fallback."""
            # block-interleaved stream: the window covering p0's two
            # 1024-entry groups spans 32 rows at comb_group_row(p0) —
            # provably 16-row-aligned for the DMA prover
            q16 = comb_group_row(p0)
            rows = pl.ds(q16, DENSIFY_WINDOW // 64)
            copies = []
            if not bounded:
                copies.append(
                    pltpu.make_async_copy(comb_hbm.at[rows, :],
                                          comb_s.at[slot], sem_s.at[slot]))
            if use_mxu:
                copies.append(
                    pltpu.make_async_copy(comb_hbm.at[rows, :],
                                          comb_v.at[slot], sem_v.at[slot]))
            return copies

        def start_segment(pi, slot):
            # SKIP empty (and sentinel-padded) segments entirely: padded
            # pool-update slots (K-bucket minus live misses — ~10k leaves
            # x 32 segments in a 10M cold chunk set) otherwise pay two
            # real DMA issue/waits each. The matching wait below guards
            # on the SAME scalar, so start/wait pairing stays exact.
            seg = k * n_per_leaf + pi

            @pl.when(lens_ref[seg] > 0)
            def _():
                for cp in window_copies(starts_ref[seg], slot):
                    cp.start()

        def mxu_row_scatter(slot, ri, lo, hi_x, h0):
            """Matmul-scatter one 128-entry window row (buffer idx row
            ri; its word row is ri + 8) into the [MXU_SPAN, 128] output
            tile at row h0 (caller guarantees the row's index span fits
            the tile)."""
            idx_row = comb_v[slot, pl.ds(ri, 1), :].astype(
                jnp.int32)                                   # [1, 128]
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (1, 128), 1)
            # lo..hi_x-1 live within ONE window row, so the
            # in-row lane bounds cannot wrap
            valid = ((lane >= (lo & 127))
                     & (lane <= ((hi_x - 1) & 127)))
            idx_m = jnp.where(valid, idx_row, -1)
            # bf16 MXU operands measured a WASH vs f32 on hardware (949 vs
            # 940 ns/segment at the 10M x 32 geometry, K=512 — the dot is
            # not the per-segment bound); default stays f32, knob kept
            # for future hardware with a different MXU f32 penalty
            mxu_dtype = (jnp.bfloat16 if os.environ.get(
                "SILO_DENSIFY_BF16", "0") == "1" else jnp.float32)
            if interpret and bounded:
                # Debug guard (interpret mode only — compiled kernels are
                # unchanged): the BOUNDED path silently never matches
                # entries outside [h0*128, (h0+span_rows)*128). A caller
                # violating the uniform partition-window contract that
                # part_h0 encodes would get corrupted rows; flag it loudly.
                hr_chk = (idx_m >> 7) - h0
                n_bad = jnp.sum(jnp.where(
                    (idx_m >= 0) & ((hr_chk < 0) | (hr_chk >= span_rows)),
                    1, 0))

                @pl.when(n_bad > 0)
                def _():
                    pl.debug_print(
                        "densify_rows BOUNDED path DROPPED {} entries "
                        "outside the part_h0 tile (caller violated the "
                        "uniform partition-window contract)", n_bad)
            wrd_row = comb_v[slot, pl.ds(ri + COMBINE_WORD_ROW_OFF, 1), :]
            hi_rel_row = (idx_m >> 7) - h0            # [1, 128]
            if aplanes:
                # A-SIDE PLANES form: fold the byte planes into the
                # one-hot A operand — A4[b*span+s, e] = (s == hi_rel[e])
                # * plane_b[e], built from [1,128] rows with SUBLANE
                # broadcasts only (no transpose); the lane one-hot C
                # needs the single remaining transpose. U = A4 @ C is
                # [4*span, 128] (3 MXU tiles at span 88 vs 4 for the
                # [span,128]x[128,512] form) and one [128,128] transpose
                # + 4 [128,128] wheres drop out of the per-row cost.
                onehot_s = (iota_s_span ==
                            jnp.broadcast_to(hi_rel_row, (span_rows, 128)))
                zero_a = jnp.zeros((span_rows, 128), mxu_dtype)
                planes_a = []
                for b in range(4):
                    p_row = ((wrd_row >> (8 * b)) &
                             jnp.uint32(255)).astype(jnp.int32).astype(
                                 mxu_dtype)               # [1, 128]
                    planes_a.append(jnp.where(
                        onehot_s,
                        jnp.broadcast_to(p_row, (span_rows, 128)), zero_a))
                a4 = jnp.concatenate(planes_a, axis=0)    # [4*span, 128]
                idx_t = jnp.broadcast_to(idx_m, (128, 128)).T
                lane_oh = (iota_l_sq == (idx_t & 127)).astype(mxu_dtype)
                u4 = jax.lax.dot(a4, lane_oh,
                                 preferred_element_type=jnp.float32)
                acc = jnp.zeros((span_rows, 128), jnp.uint32)
                for b in range(4):
                    u_b = u4[b * span_rows : (b + 1) * span_rows, :]
                    acc = acc | (u_b.astype(jnp.int32)
                                 .astype(jnp.uint32)
                                 << (8 * b))
                out_ref[0, pl.ds(h0, span_rows), :] = (
                    out_ref[0, pl.ds(h0, span_rows), :] | acc)
                return
            # A[s, e]: hi-row one-hot along lanes (e); C[e, l] carries the
            # 4 byte planes concatenated along output lanes — ONE
            # [128, 4*128] dot so the per-row MXU fixed cost is paid once
            # (segments average ~100 entries — the per-dot overhead, not
            # the flops, dominates). Mosaic has no u32<->f32 casts; route
            # through i32 (values <= 255, exact in f32/bf16 passes).
            hi_rel = jnp.broadcast_to(hi_rel_row, (span_rows, 128))
            a_mat = (iota_s_span == hi_rel).astype(mxu_dtype)
            # C[e, l]: lane one-hot needs entry-major
            # sublanes -> transpose the row tiles once
            idx_sq = jnp.broadcast_to(idx_m, (128, 128))
            idx_t = idx_sq.T  # idx_t[e, l] = idx_m[e]
            wrd_sq = jnp.broadcast_to(wrd_row, (128, 128))
            wrd_t = wrd_sq.T
            lane_oh = (iota_l_sq == (idx_t & 127))
            planes = [
                jnp.where(lane_oh,
                          ((wrd_t >> (8 * b)) &
                           jnp.uint32(255)).astype(
                              jnp.int32).astype(mxu_dtype),
                          jnp.zeros((), mxu_dtype))
                for b in range(4)
            ]
            c4 = jnp.concatenate(planes, axis=1)  # [128, 512]
            u4 = jax.lax.dot(
                a_mat, c4,
                preferred_element_type=jnp.float32)
            acc = jnp.zeros((span_rows, 128), jnp.uint32)
            for b in range(4):
                u_b = u4[:, b * 128 : (b + 1) * 128]
                acc = acc | (u_b.astype(jnp.int32)
                             .astype(jnp.uint32)
                             << (8 * b))
            out_ref[0, pl.ds(h0, span_rows), :] = (
                out_ref[0, pl.ds(h0, span_rows), :] | acc)

        def process_chunk(slot, p0, off, n, h0b=None):
            """Consume `n` entries at window offset `off` from `slot`
            (the window DMA must have completed; `h0b` is the BOUNDED
            path's precomputed tile base — with it the per-row span reads
            and the fallback vanish)."""

            def entry_span(lo, hi_x):
                """Per-entry fallback over window positions [lo, hi_x) —
                the combined SMEM window already holds the word scalars
                in lanes 128:256."""

                def per_entry(p, _):
                    ri = comb_idx_row(p)
                    i = comb_s[slot, ri, p & 127].astype(jnp.int32)
                    h = i >> 7
                    vec = jnp.where(iota == (i & 127),
                                    comb_s[slot, ri + COMBINE_WORD_ROW_OFF,
                                           p & 127],
                                    jnp.uint32(0))
                    out_ref[0, pl.ds(h, 1), :] = (
                        out_ref[0, pl.ds(h, 1), :] | vec)
                    return 0

                jax.lax.fori_loop(lo, hi_x, per_entry, 0)

            if not use_mxu:
                entry_span(off, off + n)
                return

            def per_row(r, _):
                """MXU scatter of one 128-entry window row: word
                indices are UNIQUE per segment, so scatter == SUM, and
                sum of one-hot outer products is a matmul —
                U[s, l] = sum_e A[s, e] * C[e, l] with A the hi-row
                one-hot and C the lane one-hot times the word's byte
                plane (4 byte planes: one-hot x u8 is exact in bf16
                MXU passes regardless of precision mode). ~3 ns/entry
                vs ~18 for the per-entry RMW. Rows whose index span
                exceeds the MXU_SPAN output tile (very sparse
                segments) take the per-entry path; the BOUNDED variant
                proves the fit per partition and skips the checks."""
                lo = jnp.maximum(off, r * 128)
                hi_x = jnp.minimum(off + n, (r + 1) * 128)
                # window row r -> interleaved-buffer idx row (the row's
                # first entry position is r * 128)
                ri = comb_idx_row(r * 128)

                @pl.when(lo < hi_x)
                def _():
                    if bounded:
                        mxu_row_scatter(slot, ri, lo, hi_x, h0b)
                        return
                    first = comb_s[slot, ri, lo & 127].astype(
                        jnp.int32) >> 7
                    last = comb_s[slot, ri, (hi_x - 1) & 127].astype(
                        jnp.int32) >> 7

                    # h0 8-aligned: Mosaic handles aligned multi-row
                    # dynamic slices far better than arbitrary offsets
                    h0a = jnp.minimum((first >> 3) << 3,
                                      hi - MXU_SPAN)

                    @pl.when(last - h0a < MXU_SPAN)
                    def _():
                        mxu_row_scatter(slot, ri, lo, hi_x, h0a)

                    # complement of the matmul gate ABOVE (both test
                    # last - h0a): testing last - first here left a
                    # gap — spans in [MXU_SPAN-7, MXU_SPAN-1] whose
                    # 8-alignment pushed last - h0a past MXU_SPAN
                    # matched NEITHER branch and dropped entries
                    @pl.when(last - h0a >= MXU_SPAN)
                    def _():
                        entry_span(lo, hi_x)

                return 0

            jax.lax.fori_loop(off >> 7, ((off + n - 1) >> 7) + 1,
                              per_row, 0)

        # Cross-segment prefetch pipeline, DEPTH 4: segments here are TINY
        # (cold sweeps at 10M x 32 average ~100 entries over 32 partitions
        # per leaf), so per-segment processing (~0.5 us) is SHORTER than
        # the window-DMA latency — a depth-2 double buffer still exposed
        # most of the latency on every segment (round-5 decomposition:
        # ~540 ns/segment fixed with the scatter itself contributing
        # ~115 ns). With 3 windows in flight ahead of the consumer the
        # latency pipelines away; only a segment's 2nd+ chunks (rare:
        # length > DENSIFY_CHUNK) fall back to serial DMA in their own
        # slot. Slot reuse is safe: segment pi+DEPTH's start issues at
        # iteration pi+1, after segment pi's wait at iteration pi.
        def per_partition(pi, _):
            slot = pi & (PREFETCH_SLOTS - 1)

            @pl.when(pi + PREFETCH_SLOTS - 1 < n_per_leaf)
            def _():
                start_segment(pi + PREFETCH_SLOTS - 1,
                              (pi + PREFETCH_SLOTS - 1)
                              & (PREFETCH_SLOTS - 1))

            seg = k * n_per_leaf + pi
            s = starts_ref[seg]
            length = lens_ref[seg]
            h0b = h0_ref[pi] if bounded else None

            @pl.when(length > 0)
            def _():
                # wait guarded on the SAME scalar start_segment used, so
                # every issued copy is waited exactly once
                for cp in window_copies(s, slot):
                    cp.wait()
                process_chunk(slot, s, s & 1023,
                              jnp.minimum(length, DENSIFY_CHUNK), h0b)

            def later_chunk(ci, _):
                # 2nd+ chunks of a long segment: serial DMA in this slot
                p0 = s + ci * DENSIFY_CHUNK
                for cp in window_copies(p0, slot):
                    cp.start()
                for cp in window_copies(p0, slot):
                    cp.wait()
                process_chunk(slot, p0, p0 & 1023,
                              jnp.minimum(length - ci * DENSIFY_CHUNK,
                                          DENSIFY_CHUNK), h0b)
                return 0

            n_chunks = (length + DENSIFY_CHUNK - 1) // DENSIFY_CHUNK
            jax.lax.fori_loop(1, n_chunks, later_chunk, 0)
            return 0

        for j in range(min(PREFETCH_SLOTS - 1, n_per_leaf)):
            start_segment(j, j & (PREFETCH_SLOTS - 1))
        jax.lax.fori_loop(0, n_per_leaf, per_partition, 0)

    comb_buf = (PREFETCH_SLOTS, DENSIFY_WINDOW // 64, 128)
    if bounded:
        scratch = [
            pltpu.VMEM(comb_buf, jnp.uint32),
            pltpu.SemaphoreType.DMA((PREFETCH_SLOTS,)),
        ]
        n_prefetch = 3
    elif use_mxu:
        scratch = [
            pltpu.SMEM(comb_buf, jnp.uint32),
            pltpu.VMEM(comb_buf, jnp.uint32),
            pltpu.SemaphoreType.DMA((PREFETCH_SLOTS,)),
            pltpu.SemaphoreType.DMA((PREFETCH_SLOTS,)),
        ]
        n_prefetch = 2
    else:
        scratch = [
            pltpu.SMEM(comb_buf, jnp.uint32),
            pltpu.SemaphoreType.DMA((PREFETCH_SLOTS,)),
        ]
        n_prefetch = 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(n_sparse_k,),
        in_specs=[pl.BlockSpec(memory_space=_ANY)],
        out_specs=pl.BlockSpec((1, hi, 128), lambda k, *s: (k, 0, 0)),
        scratch_shapes=scratch,
    )
    try:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 << 20)
    except Exception:  # noqa: BLE001
        compiler_params = None
    operands = ((starts, lens, jnp.asarray(part_h0, jnp.int32))
                if bounded else (starts, lens))
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_sparse_k, hi, 128), jnp.uint32),
        compiler_params=compiler_params,
        interpret=interpret,
    )(*operands, stream_comb)
    return out.reshape(n_sparse_k, n_words)


def densify_rows_into_pool(pool3, stream_comb, starts, lens,
                           slots, n_sparse_k: int, n_words: int,
                           interpret: bool | None = None, part_h0=None):
    """Densify n_sparse_k leaves and write them into pool slots (the
    hot-leaf cache): pool3 [C, PW/128, 128] comes back with slot rows
    replaced and every other row untouched. The rows build in the proven
    densify_rows kernel (~18 ns/entry); the pool write is a row-granular
    XLA scatter fused into the same executable — with the caller donating
    pool3 it updates in place (the copy is K rows, ~0.5 ms at the 10M
    shape, not a pool-sized copy). Padded grid slots point at a scratch
    row (callers reserve the last slot) and carry lens 0, so they just
    zero it.

    (A variant writing straight from the kernel via a scalar-prefetch
    OUTPUT index map + input_output_aliases hung the Mosaic compile for
    20+ minutes on real hardware — data-dependent output block indices
    are not a supported pattern; the scatter form costs nothing at row
    granularity.)"""
    hi = n_words // 128
    assert pool3.shape[1:] == (hi, 128), (pool3.shape, hi)
    rows = densify_rows(stream_comb, starts, lens,
                        n_sparse_k, n_words, interpret=interpret,
                        part_h0=part_h0)
    return pool3.at[slots].set(rows.reshape(n_sparse_k, hi, 128))
