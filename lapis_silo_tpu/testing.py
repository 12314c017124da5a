"""Synthetic corpus generation for benchmarks, the driver entrypoints, and
multi-chip dry-runs — builds a Database directly (no input files needed).

Genomes are the reference sequence plus ~`mutations_per_genome` random point
mutations, which reproduces the real workload's structure: the reference-
symbol plane is dense, mutation planes are sparse."""

from __future__ import annotations

import numpy as np

from .common.symbols import NUCLEOTIDE
from .config.database_config import DatabaseConfig, DatabaseSchema, Metadata, ValueType
from .ops import bitset
from .storage.columns import (
    DateColumnPartition,
    Dictionary,
    IndexedStringColumnPartition,
    IntColumnPartition,
    StringColumnPartition,
)
from .storage.database import Database, DataVersion
from .storage.pango_alias import PangoLineageAliasLookup
from .storage.partition import DatabasePartition
from .storage.reference_genomes import ReferenceGenomes
from .storage.rowstore import CSR_MIN_WORDS, CsrRowStore
from .storage.segment import SegmentIndex

COUNTRIES = ["Switzerland", "Germany", "France", "Italy", "Austria", "Spain"]


def synthetic_database(
    n_rows: int = 4096,
    length: int = 1024,
    n_partitions: int = 4,
    mutations_per_genome: int = 30,
    seed: int = 0,
) -> Database:
    rng = np.random.default_rng(seed)
    reference_ids = rng.integers(1, 5, size=length).astype(np.uint8)  # A/C/G/T
    reference_str = "".join(NUCLEOTIDE.chars[i] for i in reference_ids)
    genomes = ReferenceGenomes({"main": reference_str}, {})

    config = DatabaseConfig(
        schema=DatabaseSchema(
            instance_name="synthetic",
            primary_key="key",
            metadata=[
                Metadata("key", ValueType.STRING),
                Metadata("date", ValueType.DATE),
                Metadata("country", ValueType.STRING, generate_index=True),
                Metadata("age", ValueType.INT),
            ],
            date_to_sort_by="date",
        )
    )
    db = Database(config, PangoLineageAliasLookup(), genomes)
    key_dict = Dictionary()
    country_dict = Dictionary()
    db.dictionaries = {"key": key_dict, "country": country_dict}

    rows_per_partition = [
        n_rows // n_partitions + (1 if i < n_rows % n_partitions else 0)
        for i in range(n_partitions)
    ]
    row_base = 0
    for pid, part_rows in enumerate(rows_per_partition):
        partition = DatabasePartition(pid, part_rows)
        n_words = bitset.words_for(part_rows)

        # --- metadata columns (vectorized; million-row corpora skip the
        # per-row dictionary path: unique keys only matter to small tests) ---
        key_col = StringColumnPartition(key_dict)
        if part_rows < (1 << 20):
            key_col._ids = [
                key_dict.get_or_create(f"SEQ_{row_base + i}") for i in range(part_rows)
            ]
            key_col.finalize()
        else:
            key_col.ids = np.full(
                part_rows, key_dict.get_or_create("SEQ"), dtype=np.int32
            )
        date_col = DateColumnPartition(is_sorted=True)
        days = np.sort(rng.integers(1, 28, size=part_rows))
        date_col.values = ((2021 << 16) + (3 << 12) + days).astype(np.uint32)
        country_col = IndexedStringColumnPartition(country_dict)
        country_vids = np.array(
            [country_dict.get_or_create(c) for c in COUNTRIES], dtype=np.int32
        )
        country_col.ids = country_vids[
            rng.integers(0, len(COUNTRIES), size=part_rows)
        ].astype(np.int32)
        country_col._n_rows = part_rows
        for vid in np.unique(country_col.ids):
            country_col.value_bitmaps[int(vid)] = bitset.pack_bool(
                country_col.ids == vid
            )
        age_col = IntColumnPartition()
        age_col.values = rng.integers(1, 99, size=part_rows).astype(np.int32)
        partition.columns = {
            "key": key_col, "date": date_col, "country": country_col, "age": age_col,
        }

        # --- compact bitplanes: reference implicit, mutations stored ---
        n_mut = part_rows * mutations_per_genome
        rows = rng.integers(0, part_rows, size=n_mut).astype(np.int64)
        positions = rng.integers(0, length, size=n_mut).astype(np.int64)
        # dedupe (row, pos) so each row has exactly one symbol per position
        flat = rows * length + positions
        flat, unique_idx = np.unique(flat, return_index=True)
        rows, positions = rows[unique_idx], positions[unique_idx]
        # mutate to a symbol != reference: shift 1..3 within {1..4}
        shift = rng.integers(1, 4, size=len(rows)).astype(np.uint8)
        syms = ((reference_ids[positions] - 1 + shift) % 4 + 1).astype(np.int64)
        # group mutations by (symbol, position) -> one stored row each; the
        # reference symbol stays implicit (majority), so memory is compact
        # from the start (no dense [S, L, W] tensor is ever allocated)
        pair = syms * length + positions
        unique_pairs, pair_idx = np.unique(pair, return_inverse=True)
        sym_ids = (unique_pairs // length).astype(np.int32)
        pos_ids = (unique_pairs % length).astype(np.int32)
        counts = np.bincount(pair_idx, minlength=len(unique_pairs)).astype(np.int64)
        if n_words >= CSR_MIN_WORDS:
            # build CSR directly (the dense per-pair rows would be ~100x
            # bigger at multi-million-sequence scale)
            store = CsrRowStore.from_coo(
                n_words, len(unique_pairs), pair_idx.astype(np.int32),
                (rows >> 5).astype(np.int32),
                (np.uint32(1) << (rows & 31).astype(np.uint32)),
            )
        else:
            stored = np.zeros((len(unique_pairs), n_words), dtype=np.uint32)
            flat_idx = pair_idx * n_words + (rows >> 5)
            np.bitwise_or.at(
                stored.reshape(-1), flat_idx,
                np.uint32(1) << (rows & 31).astype(np.uint32),
            )
            store = stored
        partition.nuc_sequences["main"] = SegmentIndex(
            NUCLEOTIDE, reference_ids, part_rows, reference_ids,
            sym_ids, pos_ids, store, counts=counts,
        )
        partition.validate()
        db.partitions.append(partition)
        row_base += part_rows

    db.data_version = DataVersion.mine()
    return db


def sample_count_queries(db: Database, n_queries: int = 32, seed: int = 1) -> list[str]:
    """Mutation-filter count queries matching the BASELINE metric: boolean
    combinations of NucleotideEquals / HasNucleotideMutation leaves."""
    import json

    rng = np.random.default_rng(seed)
    ref = db.reference_genomes.nucleotide_ids["main"]
    length = len(ref)
    queries = []
    for qi in range(n_queries):
        def leaf():
            pos = int(rng.integers(0, length))
            if rng.random() < 0.5:
                ref_sym = int(ref[pos])
                sym = NUCLEOTIDE.chars[(ref_sym % 4) + 1]
                return {"type": "NucleotideEquals", "position": pos + 1, "symbol": sym}
            return {"type": "HasNucleotideMutation", "position": pos + 1}

        kind = qi % 4
        if kind == 0:
            filt = leaf()
        elif kind == 1:
            filt = {"type": "And", "children": [leaf(), leaf()]}
        elif kind == 2:
            filt = {"type": "Or", "children": [leaf(), {"type": "Not", "child": leaf()}]}
        else:
            filt = {
                "type": "N-Of", "numberOfMatchers": 2, "matchExactly": False,
                "children": [leaf(), leaf(), leaf()],
            }
        queries.append(json.dumps({"action": {"type": "Aggregated"},
                                   "filterExpression": filt}))
    return queries
