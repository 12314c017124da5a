"""Database facade: owns partitions, columns dictionaries, sequence metadata.

Parity with reference src/silo/database.cpp (minus boost archives — snapshots
are flat arrays + a JSON manifest, see storage/snapshot.py).
"""

from __future__ import annotations

import time

from ..common.symbols import AMINO_ACID, NUCLEOTIDE
from ..config.database_config import ColumnType, DatabaseConfig
from .pango_alias import PangoLineageAliasLookup
from .partition import DatabasePartition
from .reference_genomes import ReferenceGenomes


class DataVersion:
    """Unix-timestamp string; lexicographic ordering (common/data_version.cpp)."""

    def __init__(self, value: str):
        self.value = value

    @classmethod
    def mine(cls) -> "DataVersion":
        return cls(str(int(time.time())))

    @classmethod
    def validate(cls, value: str) -> bool:
        return value.isdigit() and len(value) > 0

    def __lt__(self, other):
        return self.value < other.value


class Database:
    def __init__(
        self,
        config: DatabaseConfig,
        alias_key: PangoLineageAliasLookup,
        reference_genomes: ReferenceGenomes,
    ):
        self.config = config
        self.alias_key = alias_key
        self.reference_genomes = reference_genomes
        self.partitions: list[DatabasePartition] = []
        # Cross-partition dictionaries per column name
        self.dictionaries: dict[str, object] = {}
        # name -> reference id arrays (aligned segments present in the index)
        self.nuc_sequences: dict[str, object] = dict(reference_genomes.nucleotide_ids)
        self.aa_sequences: dict[str, object] = dict(reference_genomes.aa_ids)
        # unaligned stores: segment name -> list per partition
        self.unaligned_nuc_sequences: dict[str, list] = {}
        self.data_version: DataVersion = DataVersion("")
        self._engine = None  # lazily created query engine

    # -- schema helpers -----------------------------------------------------

    def column_type(self, name: str) -> ColumnType | None:
        metadata = self.config.get_metadata(name)
        return metadata.column_type() if metadata else None

    def sequence_stores(self, alphabet) -> dict:
        return self.nuc_sequences if alphabet is NUCLEOTIDE else self.aa_sequences

    def default_sequence_name(self, alphabet) -> str | None:
        # Reference database.cpp:73-80: the nucleotide default is the config
        # value unconditionally; amino acids have no default sequence.
        if alphabet is NUCLEOTIDE:
            return self.config.default_nucleotide_sequence
        return None

    # -- queries ------------------------------------------------------------

    def execute_query(self, query_string: str) -> dict:
        from ..query.engine import QueryEngine

        if self._engine is None:
            self._engine = QueryEngine(self)
        return self._engine.execute(query_string)

    # -- info ---------------------------------------------------------------

    def info(self) -> dict:
        sequence_count = sum(p.sequence_count for p in self.partitions)
        total_size = 0
        n_bitmaps_size = 0
        for partition in self.partitions:
            for seg in list(partition.nuc_sequences.values()) + list(
                partition.aa_sequences.values()
            ):
                total_size += seg.size_in_bytes()
                # the missing-symbol plane is the analog of the reference's
                # per-sequence N bitmaps
                n_bitmaps_size += seg.planes[seg.alphabet.missing_id].nbytes
        return {
            "sequenceCount": sequence_count,
            "totalSize": total_size,
            "nBitmapsSize": n_bitmaps_size,
        }

    def detailed_info(self) -> dict:
        """Index introspection (analog of /info?details=true,
        reference database.cpp:122-323): per-symbol plane bytes and
        per-partition shapes."""
        per_symbol: dict[str, int] = {}
        for partition in self.partitions:
            for seg in partition.nuc_sequences.values():
                for sym_id, char in enumerate(seg.alphabet.chars):
                    per_symbol[char] = per_symbol.get(char, 0) + int(
                        seg.planes[sym_id].nbytes
                    )
        info = self.info()
        return {
            "bitmapSizePerSymbol": {"sizeInBytes": per_symbol},
            "bitmapContainerSizePerGenomeSection": {
                "sectionLength": 500,
                "bitmapContainerSizeStatistic": {},
                "totalBitmapSizeComputed": info["totalSize"],
                "totalBitmapSizeFrozen": info["totalSize"],
            },
            "partitions": [
                {
                    "partitionId": p.partition_id,
                    "sequenceCount": p.sequence_count,
                    "words": p.n_words,
                }
                for p in self.partitions
            ],
        }
