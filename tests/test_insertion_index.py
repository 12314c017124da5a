"""3-mer inverted insertion index vs a regex-scan oracle.

The index (storage/insertion_index.py) must return bit-identical results to
a plain regex scan over every distinct value — pruning is reference parity
(src/silo/storage/column/insertion_index.cpp), never a semantic change.
"""

import random
import re
import time

import numpy as np
import pytest

from lapis_silo_tpu.common.symbols import AMINO_ACID, NUCLEOTIDE
from lapis_silo_tpu.ops import bitset
from lapis_silo_tpu.storage.insertion_index import InsertionIndex


def oracle(index: InsertionIndex, position: int, pattern: str, n_rows: int):
    """Independent restatement of the REFERENCE semantics: when the pattern
    has complete 3-mers, a value must CONTAIN each literal (non-overlapping,
    stride-3 per ".*"-chunk) 3-mer as a substring AND regex-match. Literal
    containment, not regex, is the pruning predicate — for symbols that
    double as regex operators (AA '*', the '.' in some alphabets) the
    reference prunes values plain regex would match; that quirk is pinned
    (see test_star_symbol_prunes_literally)."""
    regex = re.compile(pattern)
    mers = {chunk[i : i + 3]
            for chunk in pattern.split(".*")
            for i in range(0, len(chunk) - 2, 3)}
    rows = []
    for value, ids in index.positions.get(position, {}).items():
        if mers and any(m not in value for m in mers):
            continue
        if regex.search(value):
            rows.extend(ids)
    return bitset.pack_ids(np.asarray(rows, dtype=np.int64), n_rows)


def random_value(rng, chars, lo=1, hi=12):
    return "".join(rng.choice(chars) for _ in range(rng.randint(lo, hi)))


def random_pattern(rng, chars):
    """Symbols + ".*" wildcards, like the query layer validates."""
    parts = []
    for _ in range(rng.randint(1, 3)):
        parts.append("".join(rng.choice(chars) for _ in range(rng.randint(0, 6))))
    pattern = ".*".join(parts)
    return pattern if pattern else rng.choice(chars)


@pytest.mark.parametrize("alphabet", [NUCLEOTIDE, AMINO_ACID])
def test_fuzz_matches_regex_oracle(alphabet):
    rng = random.Random(20260820)
    chars = [c for c in alphabet.iteration_chars]
    n_rows = 512
    index = InsertionIndex(alphabet)
    for row in range(n_rows):
        for _ in range(rng.randint(0, 3)):
            index.add(rng.randint(1, 8), random_value(rng, chars), row)
    index.build(n_rows)
    checked = pruned = 0
    for _ in range(300):
        position = rng.randint(1, 9)  # 9: sometimes absent
        pattern = random_pattern(rng, chars)
        try:
            re.compile(pattern)
        except re.error:
            # AA '*' can land where the regex grammar rejects it; the
            # reference's std::regex would throw identically — not a
            # pruning concern
            continue
        got = index.search(position, pattern, n_rows)
        want = oracle(index, position, pattern, n_rows)
        assert np.array_equal(got, want), (position, pattern)
        checked += 1
        if index._search_three_mers(pattern):
            pruned += 1
    assert checked > 200 and pruned > 50  # both paths exercised


def test_three_mer_extraction_stride():
    """Search-side 3-mers are NON-overlapping per chunk (reference
    extractThreeMers uses i += 3), split on the literal ".*"."""
    index = InsertionIndex(NUCLEOTIDE)
    assert index._search_three_mers("ACGTAC") == ["ACG", "TAC"]
    assert index._search_three_mers("ACGTA") == ["ACG"]      # tail < 3 dropped
    assert index._search_three_mers("AC.*GT") == []          # chunks < 3
    assert index._search_three_mers("ACG.*ACG") == ["ACG"]   # deduped
    assert index._search_three_mers(".*") == []
    with pytest.raises(ValueError, match="Wrong symbol"):
        index._search_three_mers("AXZ!")


def test_missing_three_mer_short_circuits():
    index = InsertionIndex(NUCLEOTIDE)
    index.add(1, "ACGT", 0)
    index.add(1, "TTTT", 1)
    index.build(4)
    # "GGG" appears in no value: candidate set empty without any regex work
    assert not bitset.pack_ids(np.asarray([], dtype=np.int64), 4).any()
    assert not index.search(1, "GGG", 4).any()
    # present 3-mer still confirms via regex
    got = index.search(1, "CGT", 4)
    assert np.array_equal(got, bitset.pack_ids(np.asarray([0], np.int64), 4))


def test_short_values_only_reachable_by_short_patterns():
    """Values shorter than 3 are not in the 3-mer index (reference skips
    them at build) but still match patterns without a complete 3-mer."""
    index = InsertionIndex(NUCLEOTIDE)
    index.add(5, "AG", 7)
    index.add(5, "AGGGG", 9)
    index.build(16)
    got = index.search(5, "AG", 16)
    assert np.array_equal(got, bitset.pack_ids(np.asarray([7, 9], np.int64), 16))
    got = index.search(5, "AGG", 16)  # 3-mer path: only the long value
    assert np.array_equal(got, bitset.pack_ids(np.asarray([9], np.int64), 16))


def test_star_symbol_prunes_literally():
    """AA '*' is both a stop-codon symbol and a regex repeat. The reference
    extracts it into a LITERAL 3-mer for pruning while the confirm step is
    regex (insertion_index.cpp:33-56 vs :104-110): pattern "Q*E" regex-
    matches "QQE" but the reference prunes it (no literal "Q*E" 3-mer).
    Pinned deliberately — bit-for-bit parity over plain-regex intuition."""
    index = InsertionIndex(AMINO_ACID)
    index.add(1, "QQE", 0)   # regex "Q*E" matches; literal "Q*E" absent
    index.add(1, "AQ*EA", 1)  # contains the literal 3-mer AND regex-matches
    index.build(2)
    got = index.search(1, "Q*E", 2)
    assert np.array_equal(got, bitset.pack_ids(np.asarray([1], np.int64), 2))
    # without a complete 3-mer the regex scan governs: both match
    got = index.search(1, "Q*", 2)
    assert np.array_equal(got, bitset.pack_ids(np.asarray([0, 1], np.int64), 2))


def test_build_rejects_illegal_symbols_in_long_values():
    index = InsertionIndex(NUCLEOTIDE)
    index.add(1, "AXQ", 0)  # length >= 3: validated (reference parity)
    with pytest.raises(ValueError, match="Illegal nucleotide"):
        index.build(1)


def test_pruning_is_sublinear_in_distinct_values():
    """The point of the index: a selective pattern must not pay a regex
    call per distinct value. 20k distinct values, a pattern matching a
    handful — the 3-mer path must beat the full scan by a wide margin."""
    rng = random.Random(7)
    chars = list("ACGT")
    index = InsertionIndex(NUCLEOTIDE)
    n_values = 20_000
    for row in range(n_values):
        index.add(1, random_value(rng, chars, 12, 24), row)
    index.build(n_values)

    pattern = "ACGTACGTACGT"  # 12 symbols -> 4 postings lists to intersect
    t0 = time.perf_counter()
    got = index.search(1, pattern, n_values)
    fast = time.perf_counter() - t0

    t0 = time.perf_counter()
    want = oracle(index, 1, pattern, n_values)
    scan = time.perf_counter() - t0

    assert np.array_equal(got, want)
    assert fast < scan / 5, (fast, scan)
