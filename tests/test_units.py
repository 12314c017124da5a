"""Tier-1 unit tests (in the spirit of the reference's colocated *.test.cpp:
threshold k-of-n cases, alias lookup, dates, bitsets, zstd, partitioner)."""

import numpy as np
import pytest

from lapis_silo_tpu.common import zstd
from lapis_silo_tpu.common.dates import date_to_string, string_to_date
from lapis_silo_tpu.common.symbols import AMINO_ACID, NUCLEOTIDE
from lapis_silo_tpu.ops import bitset
from lapis_silo_tpu.preprocessing.partitioner import partition_keys
from lapis_silo_tpu.query import ir
from lapis_silo_tpu.storage.pango_alias import PangoLineageAliasLookup


# --- bitset ---------------------------------------------------------------

def test_bitset_roundtrip():
    rng = np.random.default_rng(0)
    for n in [1, 31, 32, 33, 100, 4096]:
        mask = rng.random(n) < 0.3
        words = bitset.pack_bool(mask)
        assert len(words) == bitset.words_for(n)
        assert np.array_equal(bitset.unpack_words(words, n), mask)
        assert bitset.popcount(words) == mask.sum()
        ids = bitset.to_ids(words, n)
        assert np.array_equal(ids, np.nonzero(mask)[0])


def test_full_mask_tail():
    for n in [1, 31, 32, 33, 64, 65]:
        full = bitset.full_mask(n)
        assert bitset.popcount(full) == n


# --- threshold (reference operators/threshold.test.cpp cases) --------------

def _eval_threshold(k, exact, child_masks, n):
    evaluator = ir.HostEvaluator(n)
    children = [ir.Plane(bitset.pack_bool(np.asarray(m, dtype=bool))) for m in child_masks]
    return list(bitset.unpack_words(
        evaluator.evaluate(ir.Threshold(k, exact, children)), n).astype(int))


def test_threshold_k_of_n():
    a = [1, 1, 0, 0, 1]
    b = [1, 0, 1, 0, 1]
    c = [1, 0, 0, 1, 1]
    n = 5
    assert _eval_threshold(0, False, [a, b, c], n) == [1, 1, 1, 1, 1]
    assert _eval_threshold(1, False, [a, b, c], n) == [1, 1, 1, 1, 1]
    assert _eval_threshold(2, False, [a, b, c], n) == [1, 0, 0, 0, 1]
    assert _eval_threshold(3, False, [a, b, c], n) == [1, 0, 0, 0, 1]
    assert _eval_threshold(4, False, [a, b, c], n) == [0, 0, 0, 0, 0]
    assert _eval_threshold(1, True, [a, b, c], n) == [0, 1, 1, 1, 0]
    assert _eval_threshold(2, True, [a, b, c], n) == [0, 0, 0, 0, 0]
    assert _eval_threshold(3, True, [a, b, c], n) == [1, 0, 0, 0, 1]
    assert _eval_threshold(0, True, [a, b, c], n) == [0, 0, 0, 0, 0]


def test_threshold_with_negated_children():
    n = 4
    a = [1, 1, 0, 0]
    b = [1, 0, 1, 0]
    evaluator = ir.HostEvaluator(n)
    node = ir.Threshold(1, True, [
        ir.Plane(bitset.pack_bool(np.asarray(a, dtype=bool))),
        ir.Not(ir.Plane(bitset.pack_bool(np.asarray(b, dtype=bool)))),
    ])
    # counts: row0: 1+0=1, row1: 1+1=2, row2: 0+0=0, row3: 0+1=1
    assert list(bitset.unpack_words(evaluator.evaluate(node), n).astype(int)) == [1, 0, 0, 1]


# --- pango alias (reference pango_lineage_alias.test.cpp) -------------------

ALIAS = PangoLineageAliasLookup({
    "BA": ["B.1.1.529"],
    "AY": ["B.1.617.2"],
    "XA": ["B.1.1.7", "B.1.177"],  # recombinant: never unaliased
    "A": [],
})


def test_unalias():
    assert ALIAS.unalias("BA.5") == "B.1.1.529.5"
    assert ALIAS.unalias("BA") == "B.1.1.529"
    assert ALIAS.unalias("B.1.1.7") == "B.1.1.7"
    assert ALIAS.unalias("XA.1") == "XA.1"
    assert ALIAS.unalias("A.1") == "A.1"
    assert ALIAS.unalias("") == ""


def test_alias_recompress():
    assert ALIAS.alias("B.1.1.529.5") == "BA.5"
    assert ALIAS.alias("B.1.1.529") == "B.1.1.529"  # needs >3 elements to compress
    assert ALIAS.alias("B.1.617.2.4.7") == "AY.4.7"
    assert ALIAS.alias("B.1.1") == "B.1.1"


def test_parent_lineages():
    assert PangoLineageAliasLookup.parent_lineages("B.1.1.529.5") == [
        "B", "B.1", "B.1.1", "B.1.1.529", "B.1.1.529.5"]
    assert PangoLineageAliasLookup.parent_lineages("") == [""]


# --- dates ------------------------------------------------------------------

def test_date_roundtrip():
    assert string_to_date("2021-03-18") == (2021 << 16) + (3 << 12) + 18
    assert date_to_string(string_to_date("2021-03-18")) == "2021-03-18"
    assert string_to_date("") == 0
    assert string_to_date("garbage") == 0
    assert string_to_date("2021-13-01") == 0
    assert string_to_date("2021-00-01") == 0
    assert string_to_date("2021-01-32") == 0
    assert date_to_string(0) is None
    # sortable
    assert string_to_date("2021-03-18") < string_to_date("2021-04-01")
    assert string_to_date("2020-12-31") < string_to_date("2021-01-01")


# --- symbols ------------------------------------------------------------------

def test_symbol_tables():
    assert NUCLEOTIDE.count == 16
    assert AMINO_ACID.count == 25
    assert NUCLEOTIDE.to_id("-") == 0
    assert NUCLEOTIDE.to_id(".") == 0
    assert NUCLEOTIDE.to_id("U") == NUCLEOTIDE.to_id("T")
    assert NUCLEOTIDE.missing_char == "N"
    assert AMINO_ACID.missing_char == "X"
    assert AMINO_ACID.to_id("*") == 23
    assert AMINO_ACID.iteration_chars[-1] == "*"
    assert NUCLEOTIDE.valid_mutation_ids == [0, 1, 2, 3, 4]
    with pytest.raises(ValueError):
        NUCLEOTIDE.string_to_ids("ACGZ")


# --- zstd ---------------------------------------------------------------------

def test_zstd_roundtrip():
    data = b"ACGTACGTACGT" * 100
    assert zstd.decompress(zstd.compress(data)) == data


def test_zstd_dictionary():
    reference = b"ACGT" * 2500
    genome = bytearray(reference)
    genome[100:101] = b"T"
    compressor = zstd.DictCompressor(bytes(reference))
    blob = compressor.compress(bytes(genome))
    assert len(blob) < 100  # dictionary makes near-reference genomes tiny
    decompressor = zstd.DictDecompressor(bytes(reference))
    assert decompressor.decompress(blob) == bytes(genome)


# --- partitioner ----------------------------------------------------------------

def test_partitioner_greedy_merge():
    # total 100, allowed 3.125: keys merge while accumulated <= allowed
    keys = [("A", 2), ("B", 1), ("C", 1), ("D", 50), ("E", 46)]
    groups = partition_keys(keys)
    assert groups[0] == ["A", "B", "C"] or groups[0][:1] == ["A"]
    assert sum(len(g) for g in groups) == 5
    # single key
    assert partition_keys([("X", 10)]) == [["X"]]
    assert partition_keys([]) == []
