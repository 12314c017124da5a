"""Pallas popcount kernel vs numpy, interpret mode (CPU)."""

import numpy as np
import pytest


def test_popcount_rows_matches_numpy():
    from lapis_silo_tpu.ops import pallas_kernels as pk

    if not pk.HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 2**32, size=(pk.ROW_BLOCK * 2, pk.WORD_BLOCK),
                        dtype=np.uint32)
    filt = rng.integers(0, 2**32, size=pk.WORD_BLOCK, dtype=np.uint32)
    got = np.asarray(pk.popcount_rows_and_filter(rows, filt, True))
    want = np.bitwise_count(rows & filt[None, :]).sum(axis=1).astype(np.int32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("use_csa", [False, True])
def test_mutation_counts_banked_matches_numpy(use_csa):
    """Banked kernel (naive and Harley-Seal CSA forms) vs numpy, over a
    flat global-word bank with a non-zero row offset and a multi-block word
    axis (so the CSA accumulators carry across grid steps)."""
    from lapis_silo_tpu.ops import pallas_kernels as pk

    if not pk.HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(1)
    row_block, word_block = 8, 2048
    n_rows, n_words = 4 * row_block, 3 * word_block
    bank = rng.integers(0, 2**32, size=(n_rows, n_words), dtype=np.uint32)
    filters = rng.integers(0, 2**32, size=n_words, dtype=np.uint32)
    start, n_seg = row_block, 2 * row_block
    got = np.asarray(pk.mutation_counts_banked(
        bank, filters, start, n_seg, n_words, row_block, word_block,
        use_csa, True,
    ))
    want = (
        np.bitwise_count(bank[start:start + n_seg] & filters[None, :])
        .sum(axis=1).astype(np.int32)
    )
    np.testing.assert_array_equal(got, want)


def test_mutation_counts_banked_bucketed_rows():
    """seg_row_bucket may exceed the segment (and even the bank): clamped
    row blocks land in sliced-off output rows, the real rows stay exact."""
    from lapis_silo_tpu.ops import pallas_kernels as pk

    if not pk.HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(3)
    row_block = 8
    n_rows, n_words = 3 * row_block, 256
    bank = rng.integers(0, 2**32, size=(n_rows, n_words), dtype=np.uint32)
    filters = rng.integers(0, 2**32, size=n_words, dtype=np.uint32)
    start, n_stored = row_block, 2 * row_block  # bucket == 2 blocks past end
    bucket = 4 * row_block
    got = np.asarray(pk.mutation_counts_banked(
        bank, filters, start, bucket, n_words, row_block, 128, False, True,
    ))[:n_stored]
    want = (
        np.bitwise_count(bank[start:start + n_stored] & filters[None, :])
        .sum(axis=1).astype(np.int32)
    )
    np.testing.assert_array_equal(got, want)
    assert pk.seg_row_bucket(100) == 256
    assert pk.seg_row_bucket(5000) == 5120  # large segments stay exact


def test_sparse_filter_popcount_matches_numpy():
    """Mosaic dynamic-gather sparse kernel vs numpy: a multi-chunk GLOBAL
    entry stream (sorted word indices, so each [8,128] slab spans a narrow
    hi band — the kernel computes slab bounds in-kernel) with zero-padded
    tails (which make the last slabs span the FULL hi range — the
    unsorted-slab worst case is exercised too)."""
    from lapis_silo_tpu.ops import pallas_kernels as pk

    if not pk.HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(7)
    n_words = 3 * 1024
    e = 2 * pk.SPARSE_CHUNK
    filters = rng.integers(0, 2**32, size=n_words, dtype=np.uint32)
    sp_idx = np.sort(rng.integers(0, n_words, size=e)).astype(np.int32)
    sp_words = rng.integers(0, 2**32, size=e, dtype=np.uint32)
    sp_idx[-100:] = 0
    sp_words[-100:] = 0
    got = np.asarray(pk.sparse_filter_popcount(
        filters, pk.combine_stream(sp_idx, sp_words), interpret=True))
    want = np.bitwise_count(sp_words & filters[sp_idx]).astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_pad_to_blocks():
    from lapis_silo_tpu.ops import pallas_kernels as pk

    rows = np.ones((10, 5), dtype=np.uint32)
    padded = pk.pad_to_blocks(rows)
    assert padded.shape == (pk.ROW_BLOCK, pk.WORD_BLOCK)
    assert padded[:10, :5].all() and padded.sum() == 50


def test_vm_kernel_matches_xla_interpreter():
    """The Mosaic filter-VM kernel vs the XLA while_loop interpreter on a
    random program exercising every b-source, every ALU mode, threshold
    circuits, EMIT_COUNT, and the padded NOP tail — single- and multi-block
    word axes."""
    import jax.numpy as jnp

    from lapis_silo_tpu.ops import device_engine as de
    from lapis_silo_tpu.ops import pallas_kernels as pk

    if not pk.HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(5)
    n_rows, n_dyn, n_k, n_regs = 24, 3, 5, 8
    pw = 16 * 128
    bucket = 64
    bank = rng.integers(0, 1 << 32, size=(n_rows, pw), dtype=np.uint32)
    dyn = rng.integers(0, 1 << 32, size=(n_dyn, pw), dtype=np.uint32)
    sparse = rng.integers(0, 1 << 32, size=(n_k, pw), dtype=np.uint32)
    full = np.full(pw, 0xFFFFFFFF, dtype=np.uint32)
    full[-40:] = 0x7  # ragged tail like a real partition mask

    ops, opers, specs = [], [], []

    def emit(op, operand, dst, ra=0, rb=0, mode=0, bsrc=de.B_REG):
        ops.append(op)
        opers.append(operand)
        specs.append(dst | (ra << 8) | (rb << 16) | (mode << 24)
                     | (bsrc << 28))

    qi = 0
    for _ in range(12):
        bsrc = int(rng.integers(0, 6))
        hi = {de.B_BANK: n_rows, de.B_DYN: n_dyn, de.B_SPARSE: n_k}.get(bsrc, 1)
        emit(de.ALU, int(rng.integers(0, hi)), int(rng.integers(0, n_regs)),
             int(rng.integers(0, n_regs)), int(rng.integers(0, n_regs)),
             int(rng.integers(0, 5)), bsrc)
        if rng.random() < 0.4:
            emit(de.EMIT_COUNT, qi, de.NO_DST)
            qi += 1
    n_instr = len(ops)
    code = de.pack_code_array(bucket, ops, opers, specs)

    run_xla = de._interpreter(bucket, n_rows, n_dyn, 0, pw, "multi_count",
                              n_regs=n_regs)
    want_words_flat = de._interpreter(bucket, n_rows, n_dyn, 0, pw, "words",
                                      n_regs=n_regs)
    blob = np.append(code.reshape(-1),
                     np.int32(de._round_instr(n_instr)))
    args = (jnp.asarray(blob), jnp.asarray(bank), jnp.asarray(dyn),
            jnp.asarray(sparse), jnp.asarray(full))
    want_counts = np.asarray(run_xla(*args))
    want_words = np.asarray(want_words_flat(*args))

    got_words, got_counts = pk.vm_run(
        jnp.asarray(code[0]), jnp.asarray(code[1]),
        jnp.asarray([de._round_instr(n_instr)], dtype=np.int32),
        jnp.asarray(bank), jnp.asarray(dyn), jnp.asarray(sparse),
        jnp.asarray(full), n_regs=n_regs, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_words), want_words)
    np.testing.assert_array_equal(np.asarray(got_counts)[:qi],
                                  want_counts[:qi])

    # multi-block: force a tiny VMEM cap so the word axis splits; results
    # (including cross-block EMIT accumulation) must be identical
    cap = (n_regs + 3) * 128 * 4 * 4  # 4 hi-rows per block
    assert pk._vm_block_hi(pw // 128, n_regs, cap) < pw // 128
    got_words_mb, got_counts_mb = pk.vm_run(
        jnp.asarray(code[0]), jnp.asarray(code[1]),
        jnp.asarray([de._round_instr(n_instr)], dtype=np.int32),
        jnp.asarray(bank), jnp.asarray(dyn), jnp.asarray(sparse),
        jnp.asarray(full), n_regs=n_regs, interpret=True,
        vmem_cap_bytes=cap)
    np.testing.assert_array_equal(np.asarray(got_words_mb), want_words)
    np.testing.assert_array_equal(np.asarray(got_counts_mb)[:qi],
                                  want_counts[:qi])

def test_vm_kernel_accepts_bank3():
    """vm_run with the bank pre-shaped [R, PW/128, 128] (the at-rest layout
    bank3 engines use to avoid the in-executable relayout copy) must match
    the 2-D form bit for bit."""
    import jax.numpy as jnp

    from lapis_silo_tpu.ops import device_engine as de
    from lapis_silo_tpu.ops import pallas_kernels as pk

    if not pk.HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(11)
    n_rows, n_dyn, n_regs = 16, 2, 8
    pw = 8 * 128
    bucket = 16
    bank = rng.integers(0, 1 << 32, size=(n_rows, pw), dtype=np.uint32)
    dyn = rng.integers(0, 1 << 32, size=(n_dyn, pw), dtype=np.uint32)
    sparse = np.zeros((1, pw), dtype=np.uint32)
    full = np.full(pw, 0xFFFFFFFF, dtype=np.uint32)

    # r1 = bank[3]; r1 &= dyn[1]; r0 = NOT r1 (vs full); emit
    code = de.pack_code_array(
        bucket,
        [de.ALU, de.ALU, de.ALU, de.EMIT_COUNT],
        [3, 1, 0, 0],
        [1 | (de.M_MOVB << 24) | (de.B_BANK << 28),
         1 | (1 << 8) | (de.M_AND << 24) | (de.B_DYN << 28),
         0 | (1 << 8) | (de.M_ANDN << 24) | (de.B_FULL << 28),
         de.NO_DST])
    n_instr = de._round_instr(4)

    args_tail = (jnp.asarray(dyn), jnp.asarray(sparse), jnp.asarray(full))
    got2_w, got2_c = pk.vm_run(
        jnp.asarray(code[0]), jnp.asarray(code[1]),
        jnp.asarray([n_instr], dtype=np.int32), jnp.asarray(bank),
        *args_tail, n_regs=n_regs, interpret=True)
    got3_w, got3_c = pk.vm_run(
        jnp.asarray(code[0]), jnp.asarray(code[1]),
        jnp.asarray([n_instr], dtype=np.int32),
        jnp.asarray(bank.reshape(n_rows, pw // 128, 128)),
        *args_tail, n_regs=n_regs, interpret=True)
    np.testing.assert_array_equal(np.asarray(got2_w), np.asarray(got3_w))
    np.testing.assert_array_equal(np.asarray(got2_c), np.asarray(got3_c))


def test_mutation_counts_banked_bank3():
    """The 3-D (bank3) Mutations kernel path vs numpy, with a non-dividing
    word-block and a dynamic start offset."""
    from lapis_silo_tpu.ops import pallas_kernels as pk

    if not pk.HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(13)
    row_block = 8
    n_rows, n_words = 4 * row_block, 24 * 128  # n_hi=24 (not a WORD_BLOCK/128 multiple)
    bank = rng.integers(0, 2**32, size=(n_rows, n_words), dtype=np.uint32)
    filters = rng.integers(0, 2**32, size=n_words, dtype=np.uint32)
    start, n_seg = 2 * row_block, 2 * row_block
    got = np.asarray(pk.mutation_counts_banked(
        bank.reshape(n_rows, n_words // 128, 128), filters, start, n_seg,
        n_words, row_block, None, False, True,
    ))
    want = (
        np.bitwise_count(bank[start:start + n_seg] & filters[None, :])
        .sum(axis=1).astype(np.int32)
    )
    np.testing.assert_array_equal(got, want)


def test_vm_run_sharded_matches_single_device():
    """vm_run under shard_map over the 8-device CPU mesh (interpret mode):
    word-sharded bank/dyn/sparse/full, psum-merged EMIT counts — must be
    bit-identical to the single-shard kernel and the XLA interpreter."""
    import jax
    import jax.numpy as jnp

    from lapis_silo_tpu.ops import device_engine as de
    from lapis_silo_tpu.ops import pallas_kernels as pk
    from lapis_silo_tpu.parallel.mesh import make_mesh

    if not pk.HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    mesh = make_mesh()
    n_dev = mesh.devices.size
    rng = np.random.default_rng(11)
    n_rows, n_dyn, n_k, n_regs = 12, 2, 3, 8
    pw = n_dev * 2 * 128  # whole 128-lane rows per shard
    bucket = 64
    bank = rng.integers(0, 1 << 32, size=(n_rows, pw), dtype=np.uint32)
    dyn = rng.integers(0, 1 << 32, size=(n_dyn, pw), dtype=np.uint32)
    sparse = rng.integers(0, 1 << 32, size=(n_k, pw), dtype=np.uint32)
    full = np.full(pw, 0xFFFFFFFF, dtype=np.uint32)
    full[-40:] = 0x7

    ops, opers, specs = [], [], []

    def emit(op, operand, dst, ra=0, rb=0, mode=0, bsrc=de.B_REG):
        ops.append(op)
        opers.append(operand)
        specs.append(dst | (ra << 8) | (rb << 16) | (mode << 24)
                     | (bsrc << 28))

    qi = 0
    for _ in range(10):
        bsrc = int(rng.integers(0, 6))
        hi = {de.B_BANK: n_rows, de.B_DYN: n_dyn, de.B_SPARSE: n_k}.get(bsrc, 1)
        emit(de.ALU, int(rng.integers(0, hi)), int(rng.integers(0, n_regs)),
             int(rng.integers(0, n_regs)), int(rng.integers(0, n_regs)),
             int(rng.integers(0, 5)), bsrc)
        if rng.random() < 0.5:
            emit(de.EMIT_COUNT, qi, de.NO_DST)
            qi += 1
    code = de.pack_code_array(bucket, ops, opers, specs)
    ni = jnp.asarray([de._round_instr(len(ops))], dtype=np.int32)

    want_words, want_counts = pk.vm_run(
        jnp.asarray(code[0]), jnp.asarray(code[1]),
        ni, jnp.asarray(bank), jnp.asarray(dyn), jnp.asarray(sparse),
        jnp.asarray(full), n_regs=n_regs, interpret=True)

    bank3 = jnp.asarray(bank.reshape(n_rows, pw // 128, 128))
    got_words, got_counts = pk.vm_run_sharded(
        mesh, "seq", jnp.asarray(code[0]), jnp.asarray(code[1]),
        ni, bank3, jnp.asarray(dyn),
        jnp.asarray(sparse), jnp.asarray(full), n_regs=n_regs,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got_words),
                                  np.asarray(want_words))
    np.testing.assert_array_equal(np.asarray(got_counts)[:qi],
                                  np.asarray(want_counts)[:qi])


def test_densify_rows_matches_xla():
    """Mosaic densify kernel vs the XLA gather+scatter formulation
    (interpret mode): identical [K, PW] rows for ragged partition-major
    segments, including empty segments, multi-chunk segments, and the
    aligned-window over-read at the stream tail."""
    import jax
    import jax.numpy as jnp

    from lapis_silo_tpu.ops import device_engine as de
    from lapis_silo_tpu.ops import pallas_kernels as pk

    if not pk.HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(7)
    K, P = 5, 3
    n_words = 12 * 128          # per-leaf global row width
    wp = n_words // P           # per-partition word window
    n_seg = K * P
    lens = rng.integers(0, 2500, size=n_seg).astype(np.int32)
    lens[4] = 0                 # explicit empty segment
    lens = np.minimum(lens, wp)
    starts = np.zeros(n_seg, np.int32)
    pos = 0
    entries_idx, entries_wrd = [], []
    for g in range(n_seg):
        pi = g % P
        starts[g] = pos
        w = np.sort(rng.choice(wp, size=lens[g], replace=False)).astype(
            np.int32) + pi * wp
        entries_idx.append(w)
        entries_wrd.append(
            rng.integers(1, 2**32, size=lens[g], dtype=np.uint32))
        pos += lens[g]
    n_pad = (-(-(pos + pk.DENSIFY_WINDOW) // pk.COMBINE_BLOCK)
             * pk.COMBINE_BLOCK)
    idx_np = np.zeros(n_pad, np.int32)
    wrd_np = np.zeros(n_pad, np.uint32)
    idx_np[:pos] = np.concatenate(entries_idx)
    wrd_np[:pos] = np.concatenate(entries_wrd)

    comb = jnp.asarray(pk.combine_stream(idx_np, wrd_np))
    sd, ld = jnp.asarray(starts), jnp.asarray(lens)
    got = np.asarray(pk.densify_rows(comb, sd, ld, K, n_words,
                                     interpret=True))
    e_bucket = 1 << 13
    want = np.asarray(jax.jit(lambda *a: de._densify_one(
        K, e_bucket, n_words, P, *a))(comb, sd, ld))
    np.testing.assert_array_equal(got, want)


def test_densify_mxu_scatter_matches_oracle(monkeypatch):
    """The matmul-scatter densify path (one-hot A @ C per 128-entry window
    row) must be bit-exact vs a numpy scatter oracle AND vs the per-entry
    kernel, across dense clusters (matmul rows), wide spans (per-entry
    fallback rows), partial rows, multi-chunk segments, and empty
    segments. Needs n_words//128 >= MXU_SPAN to activate."""
    import jax.numpy as jnp

    from lapis_silo_tpu.ops import pallas_kernels as pk

    if not pk.HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(23)
    n_words = 128 * 256  # hi = 256 >= MXU_SPAN, wide spans fall back
    n_k, n_per_leaf = 3, 2
    segments = []
    for seg in range(n_k * n_per_leaf):
        kind = seg % 4
        if kind == 0:      # dense cluster: one matmul row, tiny span
            base = int(rng.integers(0, n_words - 700))
            idx = np.sort(rng.choice(600, size=180, replace=False)) + base
        elif kind == 1:    # wide span: every window row falls back
            idx = np.sort(rng.choice(n_words, size=150, replace=False))
        elif kind == 2:    # multi-chunk (len > 1024), mixed density
            idx = np.sort(rng.choice(n_words, size=1400, replace=False))
        else:              # empty segment
            idx = np.array([], dtype=np.int64)
        segments.append(idx.astype(np.int32))
    lens = np.array([len(s) for s in segments], dtype=np.int32)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int32)
    idx_flat = np.concatenate([s for s in segments]).astype(np.int32)
    words_flat = rng.integers(0, 1 << 32, size=idx_flat.shape[0],
                              dtype=np.uint32)
    pad = ((-len(idx_flat)) % pk.DENSIFY_WINDOW) + pk.DENSIFY_WINDOW
    idx_flat = np.concatenate([idx_flat, np.zeros(pad, np.int32)])
    words_flat = np.concatenate([words_flat, np.zeros(pad, np.uint32)])

    want = np.zeros((n_k, n_words), dtype=np.uint32)
    for seg, idx in enumerate(segments):
        leaf = seg // n_per_leaf
        s = starts[seg]
        want[leaf, idx] |= words_flat[s : s + len(idx)]

    comb = jnp.asarray(pk.combine_stream(idx_flat, words_flat))
    monkeypatch.setenv("SILO_DENSIFY_MXU", "1")
    got = np.asarray(pk.densify_rows(
        comb, jnp.asarray(starts), jnp.asarray(lens), n_k, n_words,
        interpret=True))
    np.testing.assert_array_equal(got, want)

    monkeypatch.setenv("SILO_DENSIFY_MXU", "0")
    got_scalar = np.asarray(pk.densify_rows(
        comb, jnp.asarray(starts), jnp.asarray(lens), n_k, n_words,
        interpret=True))
    np.testing.assert_array_equal(got_scalar, want)


def test_combine_stream_numpy_jnp_parity():
    """combine_stream's numpy (engine init) and jnp (in-jit) branches
    must produce identical block-interleaved bytes, and the documented
    entry->row mapping must hold."""
    import jax.numpy as jnp

    from lapis_silo_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(3)
    e = 2 * pk.COMBINE_BLOCK
    idx = rng.integers(0, 1 << 20, size=e).astype(np.int32)
    words = rng.integers(0, 1 << 32, size=e, dtype=np.uint32)
    a = pk.combine_stream(idx, words)
    b = np.asarray(pk.combine_stream(jnp.asarray(idx), jnp.asarray(words)))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (e // 64, 128)
    for p in [0, 1, 127, 128, 1023, 1024, 1025, e - 1]:
        row = (p >> 10) * 16 + ((p >> 7) & 7)
        assert a[row, p & 127] == np.uint32(idx[p])
        assert a[row + 8, p & 127] == words[p]


def test_densify_bounded_matches_oracle():
    """The BOUNDED densify path (per-partition precomputed MXU tile base,
    no SMEM idx window, no per-row span reads) must be bit-exact vs the
    numpy oracle AND vs the span-checked kernel on an engine-layout
    stream (uniform partition word windows, seg = leaf * P + pi)."""
    import jax.numpy as jnp

    from lapis_silo_tpu.ops import pallas_kernels as pk

    if not pk.HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(41)
    P = 8
    n_words = 128 * 512          # hi = 512; W = 8192 words = 64 hi rows
    wp = n_words // P
    h0 = pk.bounded_part_h0(P, n_words)
    assert h0 is not None and h0.shape == (P,)
    # production shape sanity: 10M x 32 qualifies
    assert pk.bounded_part_h0(32, 327680) is not None
    # whole-space single segment does NOT (span > MXU_SPAN)
    assert pk.bounded_part_h0(1, n_words) is None

    K = 4
    n_seg = K * P
    lens = rng.integers(0, 300, size=n_seg).astype(np.int32)
    lens[3] = 0                  # empty segment
    lens[7] = 1400               # multi-chunk segment
    lens = np.minimum(lens, wp)
    starts = np.zeros(n_seg, np.int32)
    pos = 0
    e_idx, e_wrd = [], []
    for g in range(n_seg):
        pi = g % P
        starts[g] = pos
        w = np.sort(rng.choice(wp, size=lens[g], replace=False)).astype(
            np.int32) + pi * wp
        e_idx.append(w)
        e_wrd.append(rng.integers(1, 2**32, size=lens[g], dtype=np.uint32))
        pos += lens[g]
    pad = ((-pos) % pk.DENSIFY_WINDOW) + pk.DENSIFY_WINDOW
    idx_np = np.concatenate(e_idx + [np.zeros(pad, np.int32)])
    wrd_np = np.concatenate(e_wrd + [np.zeros(pad, np.uint32)])

    want = np.zeros((K, n_words), dtype=np.uint32)
    for g in range(n_seg):
        want[g // P, e_idx[g]] |= e_wrd[g]

    args = (jnp.asarray(pk.combine_stream(idx_np, wrd_np)),
            jnp.asarray(starts), jnp.asarray(lens), K, n_words)
    got_bounded = np.asarray(pk.densify_rows(*args, interpret=True,
                                             part_h0=h0))
    np.testing.assert_array_equal(got_bounded, want)
    got_checked = np.asarray(pk.densify_rows(*args, interpret=True))
    np.testing.assert_array_equal(got_checked, want)


def test_densify_mxu_alignment_gap_regression():
    """Regression: a window row whose raw hi-span fits MXU_SPAN but whose
    8-ALIGNED span does not (span in [MXU_SPAN-7, MXU_SPAN-1], misaligned
    start) must take the per-entry fallback — the original condition pair
    tested different bases (last-first vs last-h0a) and silently dropped
    such rows' entries."""
    import jax.numpy as jnp

    from lapis_silo_tpu.ops import pallas_kernels as pk

    if not pk.HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    n_words = 128 * 256
    # two entries: hi rows 9 and 136 -> span 128 > raw span... raw span
    # last-first = 127 < 128 = MXU_SPAN, but h0a = 8 -> last-h0a = 128
    idx = np.array([9 * 128 + 3, 136 * 128 + 5], dtype=np.int32)
    words = np.array([0xDEADBEEF, 0x12345678], dtype=np.uint32)
    starts = np.array([0], dtype=np.int32)
    lens = np.array([2], dtype=np.int32)
    pad = ((-2) % pk.DENSIFY_WINDOW) + pk.DENSIFY_WINDOW
    idx_p = np.concatenate([idx, np.zeros(pad, np.int32)])
    wrd_p = np.concatenate([words, np.zeros(pad, np.uint32)])
    got = np.asarray(pk.densify_rows(
        jnp.asarray(pk.combine_stream(idx_p, wrd_p)), jnp.asarray(starts),
        jnp.asarray(lens), 1, n_words, interpret=True))
    want = np.zeros((1, n_words), dtype=np.uint32)
    want[0, idx] = words
    np.testing.assert_array_equal(got, want)
