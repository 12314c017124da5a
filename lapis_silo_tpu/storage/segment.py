"""Compact packed-u32 bitplane index for one sequence segment.

This replaces the reference's per-position Roaring bitmap maps
(src/silo/storage/sequence_store.cpp, src/silo/storage/position.cpp) with a
TPU-native *compact row* layout — the host-side twin of the device bank in
ops/device_engine.py:

- Logically the index is dense ``[S, L, W]``: S = alphabet size, L =
  reference length, W = ceil(sequence_count/32) packed words over sequence
  ids; bit ``i`` of word ``w`` = sequence ``w*32+i`` has symbol ``s`` at
  position ``p``.
- Physically only *stored rows* exist: (symbol, position) pairs that have
  any bit set AND are not the per-position majority symbol. The majority
  row is implicit (every sequence has exactly one symbol per position, so
  majority = full & ~OR(stored siblings)); empty rows are implicit zeros.
  This is the analog of the reference's deleted-most-numerous-bitmap
  optimization (position.cpp:101-127) — for real viral corpora it stores
  ~2-4 rows/position instead of 16/25 (~5x less RAM than dense, and it is
  exactly the layout the device bank wants, so snapshot load ≈ device
  upload).

Sequences ingested as NULL are all-missing: the reference skips them in
fillIndexes but marks every position in their missing-symbol bitmap
(sequence_store.cpp:160-170); here a null row simply has the missing symbol
at every position, preserving the one-symbol-per-position invariant the
implicit-majority reconstruction relies on.

Streaming build: the builder allocates rows lazily (implicit majority =
the reference symbol, so the dense reference rows are never materialized)
and re-picks the true per-position majority at finish() — host memory stays
proportional to the *compact* size throughout ingest.
"""

from __future__ import annotations

import numpy as np

from ..common.symbols import Alphabet
from ..ops import bitset

_ROW_CHUNK = 1024  # growth granularity for the builder's row store


class SegmentIndex:
    """Compact segment index.

    Attributes (all read-only after construction):
      majority    uint8[L]   per-position implicit symbol
      sym_ids     int32[ns]  stored-row symbols (pos-major order)
      pos_ids     int32[ns]  stored-row positions (ascending)
      rows        uint32[ns, W] stored-row packed words
      counts      int64[ns]  popcount per stored row
      row_map     int32[S, L]  -1 = empty, -2 = majority, else row index
      pos_offsets int64[L+1] CSR offsets: rows at position p are
                  rows[pos_offsets[p]:pos_offsets[p+1]]
    """

    def __init__(self, alphabet: Alphabet, reference_ids: np.ndarray, n_rows: int,
                 majority: np.ndarray, sym_ids: np.ndarray, pos_ids: np.ndarray,
                 rows: np.ndarray, counts: np.ndarray | None = None):
        self.alphabet = alphabet
        self.reference_ids = reference_ids
        self.length = len(reference_ids)
        self.n_rows = n_rows
        self.n_words = bitset.words_for(n_rows)
        assert rows.shape == (len(sym_ids), self.n_words), (rows.shape, len(sym_ids))
        # enforce pos-major order (contiguous per-position slices)
        if len(pos_ids) and not (np.diff(pos_ids) >= 0).all():
            order = np.lexsort((sym_ids, pos_ids))
            sym_ids, pos_ids, rows = sym_ids[order], pos_ids[order], rows[order]
            if counts is not None:
                counts = counts[order]
        self.majority = majority.astype(np.uint8)
        self.sym_ids = sym_ids.astype(np.int32)
        self.pos_ids = pos_ids.astype(np.int32)
        self.rows = rows
        if counts is None:
            counts = _chunked_row_popcounts(rows)
        self.counts = counts.astype(np.int64)
        self.row_map = np.full((alphabet.count, self.length), -1, dtype=np.int32)
        self.row_map[self.majority, np.arange(self.length)] = -2
        self.row_map[self.sym_ids, self.pos_ids] = np.arange(len(sym_ids), dtype=np.int32)
        self.pos_offsets = np.zeros(self.length + 1, dtype=np.int64)
        np.add.at(self.pos_offsets, self.pos_ids + 1, 1)
        np.cumsum(self.pos_offsets, out=self.pos_offsets)
        self.full = bitset.full_mask(n_rows)

    # -- construction ------------------------------------------------------

    @classmethod
    def from_dense(cls, alphabet: Alphabet, reference_ids: np.ndarray, n_rows: int,
                   planes: np.ndarray) -> "SegmentIndex":
        """Compact a dense [S, L, W] plane tensor (legacy snapshots, tests)."""
        set_bits = np.bitwise_count(planes).sum(axis=-1, dtype=np.int64)  # [S, L]
        majority = np.argmax(set_bits, axis=0).astype(np.uint8)
        present = set_bits > 0
        present[majority, np.arange(planes.shape[1])] = False
        sym_ids, pos_ids = np.nonzero(present)
        order = np.lexsort((sym_ids, pos_ids))
        sym_ids, pos_ids = sym_ids[order], pos_ids[order]
        rows = np.ascontiguousarray(planes[sym_ids, pos_ids])
        return cls(alphabet, reference_ids, n_rows, majority,
                   sym_ids, pos_ids, rows, counts=set_bits[sym_ids, pos_ids])

    # -- row access --------------------------------------------------------

    def stored_at(self, position: int) -> slice:
        return slice(int(self.pos_offsets[position]), int(self.pos_offsets[position + 1]))

    def plane(self, symbol_id: int, position: int) -> np.ndarray:
        """The packed words of one (symbol, position) row. Stored rows are
        returned as views (callers must not mutate); implicit rows are
        reconstructed fresh."""
        idx = int(self.row_map[symbol_id, position])
        if idx >= 0:
            return self.rows[idx]
        if idx == -1:
            return np.zeros(self.n_words, dtype=np.uint32)
        sl = self.stored_at(position)
        if sl.start == sl.stop:
            return self.full.copy()
        return self.full & ~np.bitwise_or.reduce(self.rows[sl], axis=0)

    def set_bits_matrix(self) -> np.ndarray:
        """Dense [S, L] matrix of per-row popcounts (majority reconstructed
        as n_rows - sum(stored at position))."""
        out = np.zeros((self.alphabet.count, self.length), dtype=np.int64)
        out[self.sym_ids, self.pos_ids] = self.counts
        per_pos = np.zeros(self.length, dtype=np.int64)
        np.add.at(per_pos, self.pos_ids, self.counts)
        out[self.majority, np.arange(self.length)] = self.n_rows - per_pos
        return out

    def mutation_counts(self, filter_words: np.ndarray) -> np.ndarray:
        """[S, L] popcount(plane & filter) — the host-path Mutations
        reduction (reference mutations.cpp; device twin in
        ops/device_engine.mutation_counts)."""
        out = np.zeros((self.alphabet.count, self.length), dtype=np.int64)
        filter_total = bitset.popcount(filter_words)
        stored = np.empty(len(self.sym_ids), dtype=np.int64)
        chunk = max(1, (64 << 20) // max(1, self.rows.shape[1] * 4))
        for lo in range(0, len(stored), chunk):
            stored[lo : lo + chunk] = np.bitwise_count(
                self.rows[lo : lo + chunk] & filter_words
            ).sum(axis=-1, dtype=np.int64)
        out[self.sym_ids, self.pos_ids] = stored
        per_pos = np.zeros(self.length, dtype=np.int64)
        np.add.at(per_pos, self.pos_ids, stored)
        out[self.majority, np.arange(self.length)] = filter_total - per_pos
        return out

    # -- introspection -----------------------------------------------------

    def plane_nbytes(self) -> int:
        """Bytes of ONE logical dense plane row-set [L, W] — the /info
        dense-analog unit (see storage/database.py)."""
        return self.length * self.n_words * 4

    def size_in_bytes(self) -> int:
        """Logical dense size [S, L, W] — /info reports the dense analog so
        numbers stay comparable across physical layouts."""
        return self.alphabet.count * self.plane_nbytes()

    def stored_nbytes(self) -> int:
        """Actual compact memory."""
        return int(self.rows.nbytes)

    def reconstruct_rows(self, rows: np.ndarray) -> list[str]:
        """Rebuild aligned sequence strings for the given sequence ids
        (FastaAligned action): start from the per-position majority symbol,
        override from stored rows containing the sequence's bit."""
        out = []
        chars = np.array([ord(c) for c in self.alphabet.chars], dtype=np.uint8)
        for row in rows:
            word, bit = divmod(int(row), 32)
            hits = (self.rows[:, word] >> np.uint32(bit)) & np.uint32(1)  # [ns]
            sym = self.majority.copy()
            nz = np.nonzero(hits)[0]
            sym[self.pos_ids[nz]] = self.sym_ids[nz]
            out.append(bytes(chars[sym]).decode("ascii"))
        return out


def _chunked_row_popcounts(rows: np.ndarray) -> np.ndarray:
    counts = np.empty(rows.shape[0], dtype=np.int64)
    chunk = max(1, (64 << 20) // max(1, rows.shape[1] * 4))
    for lo in range(0, rows.shape[0], chunk):
        counts[lo : lo + chunk] = np.bitwise_count(rows[lo : lo + chunk]).sum(
            axis=-1, dtype=np.int64
        )
    return counts


class SegmentIndexBuilder:
    """Streaming builder: accumulates genome batches directly into compact
    rows. During the stream the implicit majority is the *reference* symbol
    (known up front, overwhelmingly the true majority for aligned viral
    data); rows for any other (symbol, position) are allocated on first
    appearance. finish() re-picks the exact per-position majority and swaps
    rows where the reference lost (e.g. fixed mutations), so the final
    index is as small as a two-pass build — but peak host memory stays
    ~compact-sized, unlocking corpora far beyond dense-plane RAM limits."""

    def __init__(self, alphabet: Alphabet, reference_ids: np.ndarray, n_rows: int):
        self.alphabet = alphabet
        self.reference_ids = np.asarray(reference_ids, dtype=np.uint8)
        self.length = len(reference_ids)
        self.n_rows = n_rows
        self.n_words = bitset.words_for(n_rows)
        self.row_map = np.full((alphabet.count, self.length), -1, dtype=np.int32)
        self.row_map[self.reference_ids, np.arange(self.length)] = -2
        self.rows = np.zeros((0, self.n_words), dtype=np.uint32)
        self.sym_ids: list[int] = []
        self.pos_ids: list[int] = []
        self._n_stored = 0
        self._row = 0

    def _ensure_capacity(self, needed: int):
        cap = self.rows.shape[0]
        if needed <= cap:
            return
        new_cap = max(needed, cap + (cap >> 1), _ROW_CHUNK)
        grown = np.zeros((new_cap, self.n_words), dtype=np.uint32)
        grown[: self._n_stored] = self.rows[: self._n_stored]
        self.rows = grown

    def _allocate_rows(self, ids: np.ndarray):
        """Allocate stored rows for (symbol, position) pairs appearing in
        this batch that aren't mapped yet."""
        from .. import native

        present = native.presence(ids, self.alphabet.count)
        if present is None:
            present = np.zeros(self.alphabet.count * self.length, dtype=bool)
            flat = ids.astype(np.int64) * self.length + np.arange(
                self.length, dtype=np.int64
            )
            present[flat.ravel()] = True
            present = present.reshape(self.alphabet.count, self.length)
        else:
            present = present.reshape(self.alphabet.count, self.length).astype(bool)
        new = present & (self.row_map == -1)
        if not new.any():
            return
        new_syms, new_positions = np.nonzero(new)
        n_new = len(new_syms)
        self._ensure_capacity(self._n_stored + n_new)
        self.row_map[new_syms, new_positions] = self._n_stored + np.arange(
            n_new, dtype=np.int32
        )
        self.sym_ids.extend(new_syms.tolist())
        self.pos_ids.extend(new_positions.tolist())
        self._n_stored += n_new

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
        self._allocate_rows(ids)
        from .. import native

        if native.pack_batch_compact(ids, self.rows, self.row_map, start):
            self._row += batch
            return
        # numpy fallback: scatter bit-by-row via flat bitwise_or.at
        row_idx = self.row_map[ids, np.arange(self.length, dtype=np.intp)]  # [batch, L]
        seq_ids = start + np.arange(batch, dtype=np.int64)[:, None]
        words = seq_ids >> 5
        bits = (np.uint32(1) << (seq_ids & 31).astype(np.uint32))
        stored = row_idx >= 0
        flat = row_idx.astype(np.int64) * self.n_words + words
        np.bitwise_or.at(
            self.rows.reshape(-1), flat[stored],
            np.broadcast_to(bits, flat.shape)[stored],
        )
        self._row += batch

    def finish(self) -> SegmentIndex:
        assert self._row == self.n_rows, (self._row, self.n_rows)
        ns = self._n_stored
        rows = self.rows[:ns]
        sym_ids = np.asarray(self.sym_ids, dtype=np.int32)
        pos_ids = np.asarray(self.pos_ids, dtype=np.int32)
        counts = _chunked_row_popcounts(rows)
        majority = self.reference_ids.copy()
        # Re-pick the true majority where a stored row beats the implicit
        # reference row (exact, per position).
        per_pos = np.zeros(self.length, dtype=np.int64)
        np.add.at(per_pos, pos_ids, counts)
        implicit = self.n_rows - per_pos  # [L]
        best = np.zeros(self.length, dtype=np.int64)
        np.maximum.at(best, pos_ids, counts)
        full = bitset.full_mask(self.n_rows)
        for pos in np.nonzero(best > implicit)[0]:
            members = np.nonzero(pos_ids == pos)[0]
            winner = members[np.argmax(counts[members])]
            # old implicit (reference) row, computed before the swap
            ref_row = full & ~np.bitwise_or.reduce(rows[members], axis=0)
            majority[pos] = sym_ids[winner]
            rows[winner] = ref_row
            sym_ids[winner] = self.reference_ids[pos]
            counts[winner] = implicit[pos]
        # drop rows that became empty in the swap (implicit count was 0)
        keep = counts > 0
        if not keep.all():
            rows, sym_ids, pos_ids, counts = (
                rows[keep], sym_ids[keep], pos_ids[keep], counts[keep]
            )
        order = np.lexsort((sym_ids, pos_ids))
        index = SegmentIndex(
            self.alphabet, self.reference_ids, self.n_rows, majority,
            sym_ids[order], pos_ids[order],
            np.ascontiguousarray(rows[order]), counts=counts[order],
        )
        # release builder memory
        self.rows = np.zeros((0, self.n_words), dtype=np.uint32)
        return index
