"""Per-(sequence, position) insertion index.

Behavioral parity with reference src/silo/storage/column/insertion_index.cpp:
`search(position, pattern)` regex-*searches* (substring semantics,
std::regex_search) the pattern over the distinct insertion values stored at
that position and unions the row-id sets of matching values. The reference's
3-mer inverted index is purely a pruning structure; the result is defined by
the regex search, which is what we implement directly (distinct values per
position are few).
"""

from __future__ import annotations

import re

import numpy as np

from ..ops import bitset


class InsertionIndex:
    def __init__(self, alphabet):
        self.alphabet = alphabet
        # position -> {insertion value -> list[row id]}
        self.positions: dict[int, dict[str, list[int]]] = {}

    def add(self, position: int, insertion: str, sequence_id: int):
        self.positions.setdefault(position, {}).setdefault(insertion, []).append(sequence_id)

    def build(self, n_rows: int):
        # Validate stored values against the alphabet like the reference's
        # buildThreeMerIndex does (illegal symbols fail preprocessing).
        for insertions in self.positions.values():
            for value in insertions:
                if len(value) >= 3:
                    bad = self.alphabet.find_illegal_char(value)
                    if bad is not None:
                        raise ValueError(
                            f"Illegal {self.alphabet.name_lower} character '{bad}' "
                            f"in insertion: {value}"
                        )

    def search(self, position: int, pattern: str, n_rows: int) -> np.ndarray:
        insertions = self.positions.get(position)
        if not insertions:
            return bitset.empty_mask(n_rows)
        regex = re.compile(pattern)
        rows: list[int] = []
        for value, ids in insertions.items():
            if regex.search(value):
                rows.extend(ids)
        return bitset.pack_ids(np.asarray(rows, dtype=np.int64), n_rows)
