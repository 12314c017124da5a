"""Database facade: owns partitions, columns dictionaries, sequence metadata.

Parity with reference src/silo/database.cpp (minus boost archives — snapshots
are flat arrays + a JSON manifest, see storage/snapshot.py).
"""

from __future__ import annotations

import time

from ..common.symbols import NUCLEOTIDE
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
        import threading

        self._engine_lock = threading.Lock()

    @classmethod
    def empty(cls) -> "Database":
        """A database with no partitions — what the API serves before the
        first snapshot loads (reference api.cpp:178: the server starts with
        a default-constructed Database and keeps serving)."""
        from ..config.database_config import DatabaseSchema

        config = DatabaseConfig(schema=DatabaseSchema(instance_name="", primary_key=""))
        return cls(config, PangoLineageAliasLookup(), ReferenceGenomes({}, {}))

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

        with self._engine_lock:
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
                # per-sequence N bitmaps (dense-analog bytes: [L, W])
                n_bitmaps_size += seg.plane_nbytes()
        return {
            "sequenceCount": sequence_count,
            "totalSize": total_size,
            "nBitmapsSize": n_bitmaps_size,
        }

    def detailed_info(self) -> dict:
        """Index introspection: same JSON structure as the reference's
        /info?details=true (info_handler.cpp:18-71, database.cpp:122-323),
        with dense-plane analogs of the Roaring container statistics:
        every stored row is one 'bitset container'; sizes are packed-word
        bytes; per-section sizes count set-bit bytes per 500-position slice
        of the default nucleotide sequence."""
        import numpy as np

        section_length = 500
        default = self.config.default_nucleotide_sequence
        per_symbol: dict[str, int] = {}
        per_section: dict[str, list] = {}
        total_bytes = 0
        total_set_bits = 0
        n_rows_nonzero = 0
        for partition in self.partitions:
            seg = partition.nuc_sequences.get(default)
            if seg is None:
                continue
            alphabet = seg.alphabet
            set_bits = seg.set_bits_matrix()
            n_sections = -(-seg.length // section_length)
            pad = n_sections * section_length - seg.length
            padded = np.pad(set_bits, ((0, 0), (0, pad)))
            sections = padded.reshape(alphabet.count, n_sections, section_length).sum(
                axis=-1
            )
            gap_id, missing_id = 0, alphabet.missing_id
            other_ids = [i for i in range(alphabet.count)
                         if i not in (gap_id, missing_id)]
            for key, ids in (("-", [gap_id]), ("N", [missing_id]),
                             ("NOT_N_NOT_GAP", other_ids)):
                arr = (sections[ids].sum(axis=0) // 8).tolist()
                if key in per_section:
                    per_section[key] = [a + b for a, b in zip(per_section[key], arr)]
                else:
                    per_section[key] = arr
            for char in alphabet.chars:
                per_symbol[char] = per_symbol.get(char, 0) + seg.plane_nbytes()
            total_bytes += seg.size_in_bytes()
            total_set_bits += int(set_bits.sum())
            n_rows_nonzero += int((set_bits > 0).sum())
        return {
            "bitmapSizePerSymbol": per_symbol,
            "bitmapContainerSizePerGenomeSection": {
                "sectionLength": section_length,
                "sizePerGenomeSymbolAndSection": per_section,
                "bitmapContainerSizeStatistic": {
                    "numberOfArrayContainers": 0,
                    "numberOfRunContainers": 0,
                    "numberOfBitsetContainers": n_rows_nonzero,
                    "numberOfValuesStoredInArrayContainers": 0,
                    "numberOfValuesStoredInRunContainers": 0,
                    "numberOfValuesStoredInBitsetContainers": total_set_bits,
                    "totalBitmapSizeArrayContainers": 0,
                    "totalBitmapSizeRunContainers": 0,
                    "totalBitmapSizeBitsetContainers": total_bytes,
                },
                "totalBitmapSizeFrozen": total_bytes,
                "totalBitmapSizeComputed": total_bytes,
            },
        }
