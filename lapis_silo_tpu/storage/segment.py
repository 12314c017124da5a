"""Dense packed-u32 bitplane index for one sequence segment.

This replaces the reference's per-position Roaring bitmap maps
(src/silo/storage/sequence_store.cpp, src/silo/storage/position.cpp) with the
TPU-native layout: one uint32 tensor ``planes[S, L, W]`` where

- ``S``    = alphabet size (16 nucleotide / 25 amino-acid planes),
- ``L``    = reference length (positions),
- ``W``    = ceil(sequence_count / 32) packed words over sequence ids,
- bit ``i`` of ``planes[s, p, w]`` = sequence ``w*32+i`` has symbol ``s`` at
  position ``p``.

Because storage is dense there is no flipped- or deleted-symbol
reconstruction (reference position.cpp:24-127): every equality filter is a
single row gather, and the missing symbol (N/X) is an ordinary plane.
Sequences ingested as NULL are all-missing: the reference skips them in
fillIndexes but marks every position in their missing-symbol bitmap
(sequence_store.cpp:160-170), and the missing plane here plays exactly that
role — so a null row sets the missing plane at every position.
"""

from __future__ import annotations

import numpy as np

from ..common.symbols import Alphabet
from ..ops import bitset


class SegmentIndexBuilder:
    """Accumulates genomes row-block by row-block into packed planes."""

    def __init__(self, alphabet: Alphabet, reference_ids: np.ndarray, n_rows: int):
        self.alphabet = alphabet
        self.reference_ids = reference_ids
        self.length = len(reference_ids)
        self.n_rows = n_rows
        self.n_words = bitset.words_for(n_rows)
        self.planes = np.zeros(
            (alphabet.count, self.length, self.n_words), dtype=np.uint32
        )
        self._row = 0

    def add_batch(self, genomes: list[str | None]):
        """Add a batch of genomes (row-aligned with metadata order)."""
        batch = len(genomes)
        if batch == 0:
            return
        start = self._row
        # null rows are all-missing (see module docstring)
        ids = np.full((batch, self.length), self.alphabet.missing_id, dtype=np.uint8)
        for i, genome in enumerate(genomes):
            if genome is None:
                continue
            if len(genome) != self.length:
                raise ValueError(
                    f"Sequence length {len(genome)} does not match reference "
                    f"length {self.length}"
                )
            ids[i] = self.alphabet.string_to_ids(genome)
        from .. import native

        if native.pack_batch(ids, self.planes, start):
            self._row += batch
            return
        # numpy fallback: transpose to position-major, pack word block
        ids_t = np.ascontiguousarray(ids.T)  # [L, batch]
        word_lo = start // 32
        # Pack into a bool buffer covering the affected words (the batch may
        # start mid-word; OR-merge handles the overlap word).
        bit_lo = start - word_lo * 32
        span_bits = bit_lo + batch
        span_words = bitset.words_for(span_bits)
        for sym in range(self.alphabet.count):
            mask = np.zeros((self.length, span_words * 32), dtype=bool)
            mask[:, bit_lo : bit_lo + batch] = ids_t == sym
            packed = bitset.pack_bool(mask, span_words)  # [L, span_words]
            self.planes[sym, :, word_lo : word_lo + span_words] |= packed
        self._row += batch

    def finish(self) -> "SegmentIndex":
        assert self._row == self.n_rows, (self._row, self.n_rows)
        return SegmentIndex(self.alphabet, self.reference_ids, self.n_rows, self.planes)


class SegmentIndex:
    def __init__(self, alphabet: Alphabet, reference_ids: np.ndarray, n_rows: int,
                 planes: np.ndarray):
        self.alphabet = alphabet
        self.reference_ids = reference_ids
        self.length = len(reference_ids)
        self.n_rows = n_rows
        self.n_words = bitset.words_for(n_rows)
        self.planes = planes  # uint32[S, L, W]

    def plane(self, symbol_id: int, position: int) -> np.ndarray:
        return self.planes[symbol_id, position]

    def size_in_bytes(self) -> int:
        return int(self.planes.nbytes)

    def reconstruct_rows(self, rows: np.ndarray) -> list[str]:
        """Rebuild aligned sequence strings for the given row ids
        (FastaAligned action). Positions where no plane has the row's bit are
        emitted as the missing symbol only if the row is entirely unset there
        — for non-null rows every position has exactly one bit."""
        out = []
        chars = np.array([ord(c) for c in self.alphabet.chars] + [ord("?")], dtype=np.uint8)
        for row in rows:
            word, bit = divmod(int(row), 32)
            col = (self.planes[:, :, word] >> np.uint32(bit)) & np.uint32(1)  # [S, L]
            sym = np.argmax(col, axis=0)  # [L]
            has_any = col.any(axis=0)
            sym = np.where(has_any, sym, len(self.alphabet.chars))
            out.append(bytes(chars[sym]).decode("ascii"))
        return out
