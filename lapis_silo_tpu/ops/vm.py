"""Filter-VM ISA + interpreter/densify executable builders.

The register-machine instruction set, program container, shape buckets,
and the jitted executable builders (XLA while_loop interpreter, Mosaic
kernel wrappers, densify / pool-update programs). Pure functions of
shapes — no engine state — split out of device_engine.py so the engine
module carries only placement, lowering glue, dispatch, and the pool.
See device_engine.py's module docstring for the TPU-native design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Opcodes — a REGISTER machine, not a stack machine: every instruction
# performs exactly ONE unconditional register write
#     reg[dst] = mode(reg[ra], b)     b = one of six gatherable sources
# so the while_loop interpreter has no lax.switch over carried buffers. A
# switch-based stack VM measured ~66 us/instruction of pure overhead at
# W=32768 (the branch joins copy every carried buffer each instruction);
# the branchless select form is bounded by the actual word traffic — and
# since the per-instruction cost is opcode-independent, loads FUSE into
# the ALU op (one instruction per filter leaf, not two).
ALU = 0          # reg[dst] = mode(reg[ra], b(bsrc, operand/rb))
EMIT_COUNT = 1   # out[operand] = popcount(reg[ra]); used by batched queries
NOP = 2

# b-operand sources (regspec bits 28..31)
B_REG = 0     # reg[rb]
B_BANK = 1    # bank[operand]            (static plane row)
B_DYN = 2     # dyn[operand]             (per-query dynamic row)
B_SPARSE = 3  # sparse_rows[operand]     (densified sparse-tier row)
B_FULL = 4    # full_mask
B_ZERO = 5    # 0

# ALU modes (regspec bits 24..27). NOT(x) = XOR with b = full_mask (exact
# under the invariant that rows carry no bits beyond the valid sequences).
M_MOVB = 0  # b
M_AND = 1   # a & b
M_OR = 2    # a | b
M_XOR = 3   # a ^ b          (bit-sliced threshold adders; NOT via B_FULL)
M_ANDN = 4  # a & (b ^ full_mask)

# no-write destination sentinel: the register file carries one trailing
# trash slot and dynamic_update_index clamps out-of-range indices onto it
NO_DST = 255

# ---------------------------------------------------------------------------
# Wire format. _Program keeps the roomy host encoding above (operand i32 +
# regspec dst|ra<<8|rb<<16|mode<<24|bsrc<<28); what travels to the device is
# TWO i32 per instruction — operand, and a packed word that folds the opcode
# into a narrowed regspec. The instruction stream is the marginal upload cost
# of a wide dispatch (~156 B/query at 3 words/instr through a ~10-25 MB/s
# relay), so dropping 3 words -> 2 cuts the per-query wire cost by a third.
# Packed layout (28 bits used):
#   dst bits 0-5 (NO_DST saturates to 63 -> still clamps onto the trash
#   slot), ra 6-11, rb 12-17, mode 18-21, bsrc 22-25, opcode 26-27.
# ---------------------------------------------------------------------------
WIRE_DST_MASK = 0x3F
WIRE_RA_SHIFT, WIRE_RB_SHIFT = 6, 12
WIRE_MODE_SHIFT, WIRE_BSRC_SHIFT, WIRE_OP_SHIFT = 18, 22, 26


def pack_wire(opcodes, regspec):
    """Vectorized host regspec+opcode -> packed wire word (int32)."""
    spec = np.asarray(regspec, dtype=np.int64)
    dst = np.minimum(spec & 0xFF, WIRE_DST_MASK)
    packed = (dst
              | (((spec >> 8) & 0x3F) << WIRE_RA_SHIFT)
              | (((spec >> 16) & 0x3F) << WIRE_RB_SHIFT)
              | (((spec >> 24) & 0xF) << WIRE_MODE_SHIFT)
              | (((spec >> 28) & 0xF) << WIRE_BSRC_SHIFT)
              | (np.asarray(opcodes, dtype=np.int64) << WIRE_OP_SHIFT))
    return packed.astype(np.int32)


# a padded wire slot: opcode NOP, dst -> trash, b-source B_REG (no DMA)
WIRE_NOP = int(pack_wire(np.int64(NOP), np.int64(NO_DST)))


def wire_opcode(packed):
    return (packed >> WIRE_OP_SHIFT) & 0x3


def wire_bsrc(packed):
    return (packed >> WIRE_BSRC_SHIFT) & 0xF


def pack_code_array(bucket: int, opcodes, operands, regspec) -> np.ndarray:
    """[2, bucket] wire code block: row 0 = operands, row 1 = packed words
    (NOP-padded tail)."""
    code = np.zeros((2, bucket), dtype=np.int32)
    code[1, :] = WIRE_NOP
    n = len(opcodes)
    if n:
        code[0, :n] = operands
        code[1, :n] = pack_wire(opcodes, regspec)
    return code

_LEN_BUCKETS = (16, 64, 256, 512)
# top bucket sized for ~4096-query batches (the bench mix lowers to ~13
# instructions/query); the instruction stream is scalar-prefetched to SMEM
# (2 x bucket i32 = 512 KB at 65536 of the ~1 MB scoped budget), so the
# bucket can't grow unboundedly. Wide dispatches amortize the relay's
# serialized per-dispatch overhead; past ~2048-wide the CODE UPLOAD itself
# (~104 B/query in the 2-word wire format at ~10-25 MB/s relay transfer)
# becomes the marginal cost, so widths beyond 4096 buy little. Serving
# paths pin SERVE_LEN_BUCKET; the top rungs serve explicitly wide batched
# callers.
_BATCH_LEN_BUCKETS = (64, 256, 1024, 4096, 8192, 16384, 32768, 65536)
# the bucket serving paths converge on (one executable for all traffic)
SERVE_LEN_BUCKET = 8192
_DYN_BUCKETS = (1, 4, 16, 64, 256)
# sparse-leaf count per dispatch and per-leaf segment-length budget (the
# leaves gather straight from the device-resident CSR stream; the per-query
# upload is just (start, len) pairs). The engine caps K so the densified
# [K, W] block stays under ~256 MB HBM (see max_sparse_k).
_SPARSE_K_BUCKETS = (0, 4, 16, 64, 256, 1024, 2048, 4096)
# densified-block HBM cap: sets max_sparse_k = the widest K bucket whose
# [K, PW] block fits. Wide batches split at max_sparse_k; a bigger cap
# saves split round trips but drags the ladder's E floor to the worst case
# (top-max_k leaves) — measured at 1M x 16: a 1.5 GB cap (K=4096, E floor
# 2**21) ran 174 ms/512-batch vs 103 ms with 384 MB (2 splits at natural
# E=2**19). Splits are cheap (dispatches pipeline); slot waste is not.
_SPARSE_K_BYTE_CAP = 384 << 20
# SMEM cap on the densify/pool-update kernels' scalar-prefetch operands:
# starts+lens are [K * n_partitions] i32 EACH, and TPU scalar memory holds
# roughly 1 MB — a K=4096 x 32-partition update (2 x 512 KB) exhausted
# scoped SMEM on v5e (RESOURCE_EXHAUSTED at compile). 256 KB per array
# (K * P * 4 bytes -> K=2048 at 32 partitions, hardware-validated) halves
# the update-dispatch count on cold sweeps vs the earlier 128 KB cap —
# each dispatch is a serialized relay round trip, and a 2048-query cold
# batch at 10M x 32 missed ~7.6k leaves (10 chunks at K=1024).
_SPARSE_K_SMEM_BYTE_CAP = 256 << 10


def _smem_k_cap(n_partitions: int) -> int:
    """Widest K bucket whose starts/lens prefetch arrays fit the SMEM
    budget — shared by max_sparse_k (poolless densify) and the pool-update
    chunking so the two bounds cannot silently diverge. Raises when even
    the smallest bucket overflows the budget (n_partitions > 8192):
    proceeding would reintroduce the RESOURCE_EXHAUSTED Mosaic compile
    this cap exists to prevent — an explicit error beats a wedged compile."""
    fit = [b for b in _SPARSE_K_BUCKETS[1:]
           if b * n_partitions * 4 <= _SPARSE_K_SMEM_BYTE_CAP]
    if not fit:
        raise ProgramTooLarge(
            f"sparse-tier densify needs K>={_SPARSE_K_BUCKETS[1]} x "
            f"{n_partitions} partitions of i32 scalar-prefetch bounds, "
            f"over the {_SPARSE_K_SMEM_BYTE_CAP >> 10} KB SMEM budget — "
            "reduce partition count or disable the sparse tier "
            "(SILO_DENSE_BANK_BUDGET_GB)")
    return max(fit)
# flat per-partition entry budgets for the ragged densify. The densify
# pays ~45 ns per budget SLOT (gather + scatter + cumsum passes run over
# the whole static budget, not the live entries), so bucket granularity is
# a direct multiplier on sparse-batch cost — an 8x jump from 262144 to
# 2**21 measured 330 ms/batch at 1M x 16 where ~2x-stepped rungs cost half
# that. Each rung in live use is one (lazily compiled) executable.
_SPARSE_E_BUCKETS = (0, 4096, 32768, 262144, 1 << 19, 1 << 20, 1 << 21,
                     1 << 22, 1 << 23, 1 << 24)
# Per-dispatch query cap. Every dispatch costs a full relay round trip
# (~25-85 ms observed, drifting with relay load) and the relay serializes
# dispatches, so throughput is RTT-capped at (1/RTT) * MAX_BATCH_QUERIES —
# the batch must be as wide as the instruction stream (2 x bucket i32 in
# SMEM: 512 KB at the 65536 bucket) allows.
MAX_BATCH_QUERIES = 4096
MAX_REGS = 32
# register-file buckets: one executable per bucket; N-Of threshold circuits
# use ceil(log2(max(n,k)+1)) + 3 registers above their operand slot
_REG_BUCKETS = (4, 8, 16, MAX_REGS)
# instructions executed per while_loop iteration (callers round n_instr up
# to a multiple of this; iterations start at multiples of it, so the padded
# NOP tail inside the bucket is never overshot)
_UNROLL = 4


def _round_instr(n: int) -> int:
    return -(-n // _UNROLL) * _UNROLL

# Rows whose word-level density (nnz words / W, totalled over partitions)
# is below 1/SPARSE_DENSITY_CUTOFF move to the sparse tier. The tier
# auto-activates only when the projected ALL-DENSE bank would exceed
# SPARSE_BANK_BUDGET_GB (override: SILO_DENSE_BANK_BUDGET_GB env var) —
# dense count dispatches beat the densify path whenever dense fits.
SPARSE_DENSITY_CUTOFF = 8
SPARSE_BANK_BUDGET_GB = 12.0


class StructureMismatch(Exception):
    """Per-partition IRs diverged structurally; caller falls back to host."""


class ProgramTooLarge(Exception):
    pass


class _Program:
    def __init__(self):
        self.opcodes: list[int] = []
        self.operands: list[int] = []
        self.regspec: list[int] = []  # dst | ra<<8 | rb<<16 | mode<<24
        self.dyn_rows: list[list[np.ndarray]] = []  # per dyn leaf: per partition words
        # per sparse leaf: the global sparse-row id — its per-partition
        # (start, len) slice of the device-resident CSR stream is resolved
        # at dispatch assembly and gathered+scattered on device
        self.sparse_leaves: list[int] = []
        self._sparse_cache: dict = {}
        self.max_regs = MAX_REGS

    def emit(self, opcode: int, operand: int = 0, dst: int = NO_DST,
             ra: int = 0, rb: int = 0, mode: int = 0, bsrc: int = B_REG):
        self.opcodes.append(opcode)
        self.operands.append(operand)
        self.regspec.append(
            dst | (ra << 8) | (rb << 16) | (mode << 24) | (bsrc << 28)
        )

    def alu(self, mode: int, dst: int, ra: int, rb: int = 0):
        """reg[dst] = mode(reg[ra], reg[rb])"""
        self.emit(ALU, 0, dst, ra, rb, mode)

    def alu_src(self, mode: int, dst: int, ra: int, bsrc: int, operand: int = 0):
        """reg[dst] = mode(reg[ra], <bsrc source>)"""
        self.emit(ALU, operand, dst, ra, 0, mode, bsrc)

    def load(self, dst: int, bsrc: int, operand: int = 0):
        """reg[dst] = <bsrc source>"""
        self.emit(ALU, operand, dst, 0, 0, M_MOVB, bsrc)

    def add_dyn(self, rows_per_partition: list[np.ndarray]) -> int:
        self.dyn_rows.append(rows_per_partition)
        return len(self.dyn_rows) - 1

    def add_sparse(self, sparse_row_id: int) -> int:
        cached = self._sparse_cache.get(sparse_row_id)
        if cached is not None:
            return cached
        self.sparse_leaves.append(sparse_row_id)
        leaf = len(self.sparse_leaves) - 1
        self._sparse_cache[sparse_row_id] = leaf
        return leaf



@functools.lru_cache(maxsize=None)
def _pool_update_jit(k_bucket: int, n_partitions: int, n_words: int,
                     mesh=None, e_budget: int = 0):
    """In-place hot-leaf-pool update: densify up to k_bucket leaves from
    the resident CSR stream straight into their pool slots. The pool is
    donated, so XLA aliases the buffer — the dispatch writes only the
    touched rows.

    The per-leaf (start, len) bounds are STATIC per snapshot, so they
    live device-resident (`bounds` [n_sparse + 1, 2, P] i32; the engine
    uploads the table once) and the dispatch ships ONLY leaf ids + slots
    — 2 x k_bucket i32 in one packed blob. The previous form uploaded
    starts/lens per dispatch (~530 KB at K=2048 x 32 through a
    10-25 MB/s relay path), which was a large slice of the cold-sweep
    cliff. The gather to scalar-prefetch operands runs in-jit; padded
    ids point at the table's trailing all-zero sentinel row (no work).

    With `mesh`, the pool is word-sharded like the bank and each device
    densifies its own shard under shard_map via the WINDOW-LOCAL XLA
    scatter (_densify_one with w_off): the stream is replicated, so no
    communication happens at all — every device scans the whole E-budget
    (`e_budget` slots, engine-chosen per chunk) but writes only its own
    words. The Mosaic densify kernel stays the single-device path."""
    from . import pallas_kernels as pk

    if mesh is None:
        part_h0 = pk.bounded_part_h0(n_partitions, n_words)

        def run(pool, stream_comb, bounds, blob):
            ids = blob[:k_bucket]
            slots = blob[k_bucket:]
            b = bounds[ids]                      # [K, 2, P]
            starts = b[:, 0, :].reshape(-1)
            lens = b[:, 1, :].reshape(-1)
            return pk.densify_rows_into_pool(pool, stream_comb,
                                             starts, lens, slots, k_bucket,
                                             n_words, part_h0=part_h0)

        return jax.jit(run, donate_argnums=0)

    from jax.sharding import PartitionSpec as P

    shard_map = pk.get_shard_map()
    n_dev = mesh.devices.size
    assert n_words % (128 * n_dev) == 0, (n_words, n_dev)
    local_w = n_words // n_dev

    def local(pool_l, stream_full, starts_r, lens_r, slots_r):
        d = jax.lax.axis_index("seq")
        rows = _densify_one(k_bucket, e_budget, n_words, n_partitions,
                            stream_full, starts_r, lens_r,
                            w_off=d * local_w, local_words=local_w)
        return pool_l.at[slots_r].set(
            rows.reshape(k_bucket, local_w // 128, 128))

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, "seq", None), P(), P(), P(), P()),
        out_specs=P(None, "seq", None))

    def run(pool, stream_comb, bounds, blob):
        ids = blob[:k_bucket]
        slots = blob[k_bucket:]
        b = bounds[ids]                      # [K, 2, P]
        starts = b[:, 0, :].reshape(-1)
        lens = b[:, 1, :].reshape(-1)
        return sharded(pool, stream_comb, starts, lens, slots)

    return jax.jit(run, donate_argnums=0)


# fused pool-update chunk counts: one executable per rung; misses beyond
# the top rung dispatch eagerly (rare — >4 x k_cap misses in one batch)
_POOL_CHUNK_BUCKETS = (0, 1, 2, 4)


@functools.lru_cache(maxsize=None)
def _pooled_update_vm_jit(program_len: int, n_rows: int, n_dyn: int,
                          pool_slots: int, n_words: int, output: str,
                          n_regs: int, n_chunks: int, k_bucket: int,
                          n_partitions: int):
    """ONE dispatch for a pooled sparse batch: densify up to n_chunks
    update chunks into their (donated) pool slots, then run the VM over
    the refreshed pool — all inside a single XLA program. The separate
    update dispatches each carried a serialized relay round-trip charge
    (~50 ms measured at 10M x 32: 5 updates + 2 VMs made a 2048-query
    cold batch ~510 ms of which ~2/3 was dispatch overhead). The
    scalar-prefetch SMEM cap is per pallas_call, so several K-capped
    densify kernels coexist in one program.

    Blob layout: [code 2 x L, n_instr, then n_chunks x (k_bucket ids +
    k_bucket slots)]; padded ids point at the bounds table's sentinel
    row (len 0) with slots -> the scratch row."""
    from . import pallas_kernels as pk

    vm = _interpreter(program_len, n_rows, n_dyn, pool_slots + 1, n_words,
                      output, n_regs, mesh=None)
    code_len = 2 * program_len
    part_h0 = pk.bounded_part_h0(n_partitions, n_words)

    def run(pool, bank, dyn, stream_comb, bounds, blob,
            full_masks):
        off = code_len + 1
        for c in range(n_chunks):
            ids = blob[off + 2 * c * k_bucket
                       : off + (2 * c + 1) * k_bucket]
            slots = blob[off + (2 * c + 1) * k_bucket
                         : off + (2 * c + 2) * k_bucket]
            b = bounds[ids]                      # [K, 2, P]
            starts = b[:, 0, :].reshape(-1)
            lens = b[:, 1, :].reshape(-1)
            pool = pk.densify_rows_into_pool(
                pool, stream_comb, starts, lens, slots,
                k_bucket, n_words, part_h0=part_h0)
        counts = vm(blob[: code_len + 1], bank, dyn, pool, full_masks)
        return counts, pool

    return jax.jit(run, donate_argnums=0)


def _densify_one(n_sparse_k: int, n_sparse_e: int, n_words: int,
                 n_per_leaf: int, stream_comb, starts, lens,
                 w_off=None, local_words: int | None = None):
    """[K, PW] densified sparse-tier rows (global word space), via a FLAT
    ragged gather+scatter over an E-entry budget: per-element scatter cost
    ~29 ns means work must scale with the ACTUAL entry count, not the
    K x max-row-length rectangle (which paid up to ~670x padding on wide
    batches — 80 qps at 10M x 32 partitions). Slot -> segment mapping comes
    from a marker scatter + cummax (no searchsorted: its binary search
    would gather log K times per slot). The stream is PARTITION-major, so
    each leaf is n_per_leaf contiguous slices, seg = leaf * n_per_leaf +
    partition.

    This is the XLA FALLBACK (CPU, mesh-sharded engines): on TPU the
    Mosaic kernel (pallas_kernels.densify_rows) builds each leaf row in
    VMEM at ~18 ns/entry — this path is TRANSACTION-bound at ~100 ns/slot
    (measured at the 10M shape: 2 stream gathers + 1 table gather + 1
    scatter per slot; the per-segment tables fold in-jit so the slot ->
    stream mapping costs ONE table gather).

    `w_off` / `local_words` select the WINDOW-LOCAL form (mesh shard_map
    callers): only entries whose global word index falls in
    [w_off, w_off + local_words) scatter, into [K, local_words] rows in
    local coordinates — every device scans the replicated stream but
    writes only its own word shard, so a sharded densify needs no
    communication at all."""
    n_seg = n_sparse_k * n_per_leaf
    lens = lens.astype(jnp.int32)
    cum = jnp.cumsum(lens)                                    # [K*P] inclusive
    total = cum[-1]
    row_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), cum[:-1]])                  # [K*P]
    seed_pos = jnp.where(lens > 0, row_start, n_sparse_e)
    delta = starts - row_start
    slots = jnp.arange(n_sparse_e, dtype=jnp.int32)
    s_idx = jnp.arange(n_seg, dtype=jnp.int32)
    # seed each segment's first slot with its index+1 (empty segments have
    # seed_pos = E -> dropped; non-empty starts are unique), cummax fills
    seed = jnp.zeros(n_sparse_e, jnp.int32).at[seed_pos].max(
        s_idx + 1, mode="drop")
    seg = jax.lax.cummax(seed) - 1                            # [E]
    seg_c = jnp.clip(seg, 0, n_seg - 1)
    src = jnp.clip(slots + delta[seg_c], 0,
                   stream_comb.shape[0] * 64 - 1)
    valid = (slots < total) & (seg >= 0)
    # block-interleaved combined stream: the interleave address arithmetic
    # is centralized in pallas_kernels (comb_idx_row) — XLA fuses the row
    # arithmetic into the gathers
    from . import pallas_kernels as pk

    row = pk.comb_idx_row(src)
    gi = stream_comb[row, src & 127].astype(jnp.int32)
    gw = stream_comb[row + pk.COMBINE_WORD_ROW_OFF, src & 127]
    leaf = seg_c // n_per_leaf
    out_words = n_words if local_words is None else local_words
    if w_off is not None:
        valid = valid & (gi >= w_off) & (gi < w_off + out_words)
        gi = gi - w_off
    flat = jnp.where(valid, leaf * out_words + gi, n_sparse_k * out_words)
    out = jnp.zeros(n_sparse_k * out_words, jnp.uint32).at[flat].set(
        gw, mode="drop")
    return out.reshape(n_sparse_k, out_words)


@functools.lru_cache(maxsize=16)
def _densify_jit(n_sparse_k: int, n_sparse_e: int, n_words: int,
                 n_per_leaf: int):
    """Standalone densify executable (used by paths that keep densify as
    its own dispatch)."""
    return jax.jit(functools.partial(_densify_one, n_sparse_k,
                                     n_sparse_e, n_words, n_per_leaf))


@functools.lru_cache(maxsize=64)
def _interpreter(program_len: int, n_rows: int, n_dyn: int, n_sparse_k: int,
                 n_words: int, output: str = "words",
                 n_regs: int = MAX_REGS, n_sparse_e: int = 0,
                 n_per_leaf: int = 1, mesh=None,
                 resident_bounds: bool = False):
    """Jitted register-machine interpreter for one shape bucket, over the
    FLAT global word axis (n_words = partitions x per-partition words).
    output='words' returns the [PW] bitset (reg[0]); output='count' fuses
    the popcount reduction into the same executable (one dispatch);
    'multi_count' returns per-query EMIT_COUNT outputs.

    With n_sparse_e > 0 the sparse-leaf densification runs INSIDE the same
    executable (stream + per-leaf bounds in, [K, PW] block scattered on
    device) — sparse-touching queries stay a single dispatch. Otherwise
    densified rows arrive as a [K, PW] input.

    On TPU the VM body is the Mosaic kernel (pallas_kernels.vm_run):
    registers live in VMEM for the whole program, so each instruction costs
    ONE row DMA instead of the XLA while_loop's ~13 register-file passes
    (37 us/instr measured at 327680 flat words)."""
    from . import pallas_kernels as pk

    n_dev = mesh.devices.size if mesh is not None else 1
    maybe_kernel = (
        pk.HAVE_PALLAS
        and (jax.default_backend() != "cpu" or pk.interpret_default())
        and n_words % (128 * n_dev) == 0
        and pk._vm_block_hi(n_words // n_dev // 128, n_regs) is not None
        and pk.VM_MAX_BATCH == MAX_BATCH_QUERIES
    )

    def run_one(code, bank, dyn, sparse_rows, full_masks, n_instr):
        # The Mosaic kernel needs the bank at rest in its 3-D shape (a 2-D
        # bank would force a full in-executable relayout copy). On a mesh
        # the kernel runs per word shard under shard_map with EMIT counts
        # psum-merged (vm_run_sharded) — a bare pallas_call over a sharded
        # bank would make XLA gather it whole.
        if maybe_kernel and bank.ndim == 3:
            if mesh is not None:
                return pk.vm_run_sharded(
                    mesh, "seq", code[0], code[1],
                    n_instr.reshape(1), bank, dyn, sparse_rows,
                    full_masks, n_regs=n_regs)
            return pk.vm_run(code[0], code[1],
                             n_instr.reshape(1), bank, dyn, sparse_rows,
                             full_masks, n_regs=n_regs)
        if bank.ndim == 3:
            # rare fallback (e.g. register file past the kernel's VMEM
            # budget): flatten inside the jit — correct everywhere, the
            # relayout cost only hits this path
            bank = bank.reshape(bank.shape[0], -1)
        base_run = build_run_one_with_emit(
            program_len, n_rows, n_dyn, n_words, n_sparse_k=n_sparse_k,
            n_regs=n_regs, with_emit=output == "multi_count")
        return base_run(code, bank, dyn, sparse_rows, full_masks, n_instr)

    def finish(words, outs):
        if output == "count":
            return jax.lax.population_count(words).astype(jnp.int32).sum(dtype=jnp.int32)
        if output == "multi_count":
            return outs  # [MAX_BATCH_QUERIES]
        if output.startswith("compact"):
            # row extraction fused into the SAME dispatch: selective
            # filters transfer (n_nonzero_words, first-cap indices, their
            # words) — KBs — instead of the full [PW] bitset; the caller
            # falls back to a full pull when the result overflows the cap
            cap = int(output.split(":")[1])
            nz = words != 0
            n_nz = nz.sum(dtype=jnp.int32)
            idx = jnp.nonzero(nz, size=cap, fill_value=0)[0].astype(jnp.int32)
            return n_nz, idx, words[idx], words
        return words

    code_len = 2 * program_len
    if n_sparse_e and n_sparse_k:
        densify = functools.partial(_densify_one, n_sparse_k, n_sparse_e,
                                    n_words, n_per_leaf)
        n_seg = n_sparse_k * n_per_leaf
        # Mosaic densify (pallas_kernels.densify_rows): builds each leaf
        # row in VMEM at ~18 ns/entry (6x the XLA gather+scatter path,
        # measured at the 10M sub-dispatch shape) — cost scales with LIVE
        # entries, not the E slot budget. Mesh engines keep the XLA path
        # on this POOLLESS fused route (the window-local sharded scatter
        # lives in the pool-update path, which mesh engines use by
        # default — see _pool_update_jit).
        use_densify_kernel = (
            pk.HAVE_PALLAS
            and (jax.default_backend() != "cpu" or pk.interpret_default())
            and mesh is None
            and n_words % 128 == 0
        )
        part_h0 = pk.bounded_part_h0(n_per_leaf, n_words)

        def densify_and_run(code, starts, lens, n_instr, bank, dyn,
                            stream_comb, full_masks):
            if use_densify_kernel:
                sparse_rows = pk.densify_rows(
                    stream_comb, starts, lens, n_sparse_k,
                    n_words, part_h0=part_h0)
            else:
                sparse_rows = densify(stream_comb, starts, lens)
            words, outs = run_one(code, bank, dyn, sparse_rows, full_masks,
                                  n_instr)
            return finish(words, outs)

        if resident_bounds:
            def run_fused_resident(blob, bank, dyn, stream_comb,
                                   full_masks, bounds):
                # per-leaf (start, len) bounds are static per snapshot and
                # live device-resident — the upload carries LEAF IDS only
                # (2 x K x P i32 of bounds was ~524 KB per sub-dispatch at
                # the 10M x 32 shape, a large slice of the cold-sweep cost
                # through a 10-25 MB/s relay path). Padded ids point at the
                # table's trailing all-zero sentinel row.
                code = blob[:code_len].reshape(2, program_len)
                ids = blob[code_len : code_len + n_sparse_k]
                n_instr = blob[-1]
                b = bounds[ids]                      # [K, 2, P]
                starts = b[:, 0, :].reshape(-1)
                lens = b[:, 1, :].reshape(-1)
                return densify_and_run(code, starts, lens, n_instr, bank,
                                       dyn, stream_comb,
                                       full_masks)

            return jax.jit(run_fused_resident)

        def run_fused(blob, bank, dyn, stream_comb,
                      full_masks):
            # ONE packed upload: code + per-leaf bounds + n_instr (each
            # separate host->device transfer costs a relay round trip)
            code = blob[:code_len].reshape(2, program_len)
            starts = blob[code_len : code_len + n_seg]
            lens = blob[code_len + n_seg : code_len + 2 * n_seg]
            n_instr = blob[-1]
            return densify_and_run(code, starts, lens, n_instr, bank, dyn,
                                   stream_comb, full_masks)

        return jax.jit(run_fused)

    def run(blob, bank, dyn, sparse_rows, full_masks):
        # packed upload: code (3 x L) + trailing n_instr in one array
        code = blob[:code_len].reshape(2, program_len)
        words, outs = run_one(code, bank, dyn, sparse_rows, full_masks,
                              blob[code_len])
        return finish(words, outs)

    return jax.jit(run)


def build_run_one(program_len: int, n_rows: int, n_dyn: int, n_words: int,
                  n_regs: int = MAX_REGS):
    """VM body returning only the result words (the form parallel/mesh.py
    and __graft_entry__ jit over a mesh); executes the full padded program
    (NOPs write only the trash register)."""
    full = build_run_one_with_emit(program_len, n_rows, n_dyn, n_words,
                                   n_regs=n_regs, with_emit=False)

    def run_one(code, bank, dyn, full_mask):
        sparse_rows = jnp.zeros((1, dyn.shape[-1]), jnp.uint32)
        words, _outs = full(code, bank, dyn, sparse_rows, full_mask,
                            code.shape[1])
        return words

    return run_one


def build_run_one_with_emit(program_len: int, n_rows: int, n_dyn: int, n_words: int,
                            n_sparse_k: int = 0, n_regs: int = MAX_REGS,
                            with_emit: bool = True):
    """The single-partition register-machine body (un-jitted). Returns
    (reg[0] words, EMIT_COUNT output vector). `n_instr` is a traced scalar:
    the while_loop executes only the real instructions, so one compiled
    executable serves every program length up to `program_len`.

    Every instruction is BRANCHLESS: it gathers the candidate rows, selects
    one by opcode/mode, and performs a single unconditional register write
    (no-write opcodes carry dst=NO_DST, which the clamped index maps onto a
    trailing trash slot). A lax.switch formulation measured ~66 us/instr of
    pure overhead at W=32768 — the branch joins copied every carried buffer
    per instruction; this form is bounded by actual word traffic."""

    def run_one(code, bank, dyn, sparse_rows, full_mask, n_instr):
        if sparse_rows.ndim == 3:
            # 3-D leaf pool (kernel-at-rest layout); this XLA fallback is
            # rare (register file past the kernel budget, CPU tests) — the
            # in-jit relayout cost only hits here
            sparse_rows = sparse_rows.reshape(sparse_rows.shape[0], -1)
        operands, packed = code[0], code[1]
        zero_row = jnp.zeros((n_words,), jnp.uint32)

        def step(state):
            ip, regs, out = state
            operand = operands[ip]
            spec = packed[ip]
            opcode = (spec >> WIRE_OP_SHIFT) & 0x3
            dst = spec & WIRE_DST_MASK
            ra = (spec >> WIRE_RA_SHIFT) & 0x3F
            rb = (spec >> WIRE_RB_SHIFT) & 0x3F
            mode = (spec >> WIRE_MODE_SHIFT) & 0xF
            bsrc = (spec >> WIRE_BSRC_SHIFT) & 0xF

            # dynamic row slices (no vmap in sight — the partition axis is
            # folded into the word axis, so these lower to real
            # dynamic-slice ops, not gathers over the whole array)
            a = jax.lax.dynamic_index_in_dim(
                regs, jnp.minimum(ra, n_regs - 1), 0, keepdims=False)
            bank_row = jax.lax.dynamic_index_in_dim(
                bank, jnp.clip(operand, 0, n_rows - 1), 0, keepdims=False)
            dyn_row = jax.lax.dynamic_index_in_dim(
                dyn, jnp.clip(operand, 0, n_dyn - 1), 0, keepdims=False)
            sparse_row = jax.lax.dynamic_index_in_dim(
                sparse_rows, jnp.clip(operand, 0, max(n_sparse_k, 1) - 1), 0,
                keepdims=False)

            b = jnp.where(
                bsrc == B_REG, jax.lax.dynamic_index_in_dim(
                    regs, jnp.minimum(rb, n_regs - 1), 0, keepdims=False),
                jnp.where(
                    bsrc == B_BANK, bank_row,
                    jnp.where(
                        bsrc == B_DYN, dyn_row,
                        jnp.where(
                            bsrc == B_SPARSE, sparse_row,
                            jnp.where(bsrc == B_FULL, full_mask, zero_row),
                        ),
                    ),
                ),
            )
            val = jnp.where(
                mode == M_MOVB, b,
                jnp.where(
                    mode == M_AND, a & b,
                    jnp.where(
                        mode == M_OR, a | b,
                        jnp.where(mode == M_XOR, a ^ b, a & (b ^ full_mask)),
                    ),
                ),
            )
            # single unconditional write; dst=NO_DST clamps onto the trash
            # slot (index n_regs), so no-write opcodes stay branchless
            regs = jax.lax.dynamic_update_index_in_dim(
                regs, val, jnp.minimum(dst, n_regs), 0
            )
            if with_emit:
                count = jax.lax.population_count(a).astype(jnp.int32).sum(
                    dtype=jnp.int32)
                oi = jnp.where(opcode == EMIT_COUNT, operand,
                               MAX_BATCH_QUERIES)
                out = out.at[oi].set(count, mode="drop")
            return ip + 1, regs, out

        def step_unrolled(state):
            # execute _UNROLL instructions per loop iteration to amortize
            # the while_loop's fixed per-iteration overhead (callers round
            # n_instr up; NOPs only write the trash slot)
            for _ in range(_UNROLL):
                state = step(state)
            return state

        regs0 = jnp.zeros((n_regs + 1, n_words), jnp.uint32)
        out0 = jnp.zeros((MAX_BATCH_QUERIES,), jnp.int32)
        _, regs, out = jax.lax.while_loop(
            lambda state: state[0] < n_instr,
            step_unrolled,
            (jnp.int32(0), regs0, out0),
        )
        return regs[0], out

    return run_one

