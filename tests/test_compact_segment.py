"""Compact segment index: streaming builder == dense oracle, including the
finish()-time majority swap for positions where a mutation beats the
reference symbol."""

import numpy as np
import pytest

from lapis_silo_tpu.common.symbols import NUCLEOTIDE
from lapis_silo_tpu.ops import bitset
from lapis_silo_tpu.storage.segment import SegmentIndex, SegmentIndexBuilder


def _dense_from_genomes(reference_ids, genomes):
    """Oracle: dense [S, L, W] planes built naively."""
    length = len(reference_ids)
    n = len(genomes)
    planes = np.zeros((NUCLEOTIDE.count, length, bitset.words_for(n)), dtype=np.uint32)
    for i, genome in enumerate(genomes):
        ids = (np.full(length, NUCLEOTIDE.missing_id, dtype=np.uint8)
               if genome is None else NUCLEOTIDE.string_to_ids(genome))
        for pos in range(length):
            planes[ids[pos], pos, i >> 5] |= np.uint32(1) << np.uint32(i & 31)
    return planes


def _random_genomes(rng, reference_ids, n, majority_flip_positions=()):
    """Reference + point mutations; at flip positions >50% of genomes carry
    the same mutation (forcing a majority swap), plus some null genomes."""
    length = len(reference_ids)
    chars = np.array(list(NUCLEOTIDE.chars))
    genomes = []
    for i in range(n):
        ids = reference_ids.copy()
        for _ in range(rng.integers(0, 4)):
            pos = int(rng.integers(0, length))
            ids[pos] = (ids[pos] % 4) + 1
        if rng.random() < 0.1:
            pos = int(rng.integers(0, length))
            ids[pos] = NUCLEOTIDE.missing_id
        for pos in majority_flip_positions:
            if i % 4 != 0:  # 75% carry the fixed mutation
                ids[pos] = (reference_ids[pos] % 4) + 1
        genomes.append("".join(chars[ids]))
    genomes[3] = None  # a null row (all-missing)
    return genomes


@pytest.mark.parametrize("force_csr", [False, True])
@pytest.mark.parametrize("batch_size", [1, 7, 32, 64])
def test_streaming_builder_matches_dense(batch_size, force_csr):
    rng = np.random.default_rng(0)
    length, n = 40, 50
    reference_ids = rng.integers(1, 5, size=length).astype(np.uint8)
    genomes = _random_genomes(rng, reference_ids, n, majority_flip_positions=(5, 17))

    builder = SegmentIndexBuilder(NUCLEOTIDE, reference_ids, n, force_csr=force_csr)
    for lo in range(0, n, batch_size):
        builder.add_batch(genomes[lo : lo + batch_size])
    compact = builder.finish()
    assert compact.store.kind == ("csr" if force_csr else "dense")

    dense = _dense_from_genomes(reference_ids, genomes)
    oracle = SegmentIndex.from_dense(NUCLEOTIDE, reference_ids, n, dense)

    # identical logical planes, row by row
    for sym in range(NUCLEOTIDE.count):
        for pos in range(length):
            np.testing.assert_array_equal(
                compact.plane(sym, pos), dense[sym, pos], err_msg=f"{sym}@{pos}"
            )
    # the majority swap happened at the flip positions
    assert compact.majority[5] != reference_ids[5]
    assert compact.majority[17] != reference_ids[17]
    # and matches the exact argmax choice
    np.testing.assert_array_equal(
        compact.set_bits_matrix(), oracle.set_bits_matrix()
    )
    assert len(compact.sym_ids) == len(oracle.sym_ids)


@pytest.mark.parametrize("force_csr", [False, True])
def test_mutation_counts_matches_dense_and(force_csr):
    rng = np.random.default_rng(1)
    length, n = 30, 70
    reference_ids = rng.integers(1, 5, size=length).astype(np.uint8)
    genomes = _random_genomes(rng, reference_ids, n)
    builder = SegmentIndexBuilder(NUCLEOTIDE, reference_ids, n, force_csr=force_csr)
    builder.add_batch(genomes)
    compact = builder.finish()
    dense = _dense_from_genomes(reference_ids, genomes)

    filter_mask = rng.random(n) < 0.5
    words = bitset.pack_bool(filter_mask)
    expected = np.bitwise_count(dense & words[None, None, :]).sum(
        axis=-1, dtype=np.int64
    )
    np.testing.assert_array_equal(compact.mutation_counts(words), expected)


@pytest.mark.parametrize("force_csr", [False, True])
def test_reconstruct_rows_roundtrip(force_csr):
    rng = np.random.default_rng(2)
    length, n = 25, 40
    reference_ids = rng.integers(1, 5, size=length).astype(np.uint8)
    genomes = _random_genomes(rng, reference_ids, n, majority_flip_positions=(3,))
    builder = SegmentIndexBuilder(NUCLEOTIDE, reference_ids, n, force_csr=force_csr)
    builder.add_batch(genomes)
    compact = builder.finish()
    missing = NUCLEOTIDE.chars[NUCLEOTIDE.missing_id] * length
    out = compact.reconstruct_rows(np.arange(n))
    for i, genome in enumerate(genomes):
        assert out[i] == (genome if genome is not None else missing), i


def test_numpy_fallback_matches_native(monkeypatch):
    """Force the numpy scatter path and compare against the native path."""
    import lapis_silo_tpu.native as native

    rng = np.random.default_rng(3)
    length, n = 33, 45
    reference_ids = rng.integers(1, 5, size=length).astype(np.uint8)
    genomes = _random_genomes(rng, reference_ids, n)

    builder_native = SegmentIndexBuilder(NUCLEOTIDE, reference_ids, n)
    builder_native.add_batch(genomes)
    native_index = builder_native.finish()

    monkeypatch.setattr(native, "pack_batch_compact", lambda *a, **k: False)
    monkeypatch.setattr(native, "presence", lambda *a, **k: None)
    builder_np = SegmentIndexBuilder(NUCLEOTIDE, reference_ids, n)
    builder_np.add_batch(genomes)
    np_index = builder_np.finish()

    np.testing.assert_array_equal(native_index.majority, np_index.majority)
    np.testing.assert_array_equal(native_index.sym_ids, np_index.sym_ids)
    np.testing.assert_array_equal(native_index.store.rows, np_index.store.rows)
