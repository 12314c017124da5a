"""The ingest pipeline: metadata + FASTA/NDJSON -> Database.

Parity with reference src/silo/preprocessing/preprocessor.cpp, redesigned
host-side (no DuckDB): the metadata table is a list of row dicts, the
partitioner is partitioner.py, and sequence ingestion packs genomes directly
into dense bitplanes (storage/segment.py) in row-block batches.

Row order within a partition is ORDER BY (dateToSortBy NULLS FIRST,
primaryKey) — reference database_config.cpp:190-198 + DuckDB 0.8 null
ordering — which the sorted-date range filters depend on.
"""

from __future__ import annotations

import logging
import time

from ..common.dates import string_to_date
from ..common.symbols import AMINO_ACID, NUCLEOTIDE
from ..config.database_config import ColumnType, DatabaseConfig
from ..storage.columns import (
    DateColumnPartition,
    Dictionary,
    FloatColumnPartition,
    IndexedStringColumnPartition,
    InsertionColumnPartition,
    IntColumnPartition,
    PangoLineageColumnPartition,
    StringColumnPartition,
)
from ..storage.database import Database, DataVersion
from ..storage.pango_alias import PangoLineageAliasLookup
from ..storage.partition import DatabasePartition
from ..storage.reference_genomes import ReferenceGenomes
from ..storage.segment import SegmentIndexBuilder
from ..storage.unaligned import UnalignedPartitionStore
from . import readers
from .partitioner import partition_keys, sort_key_nulls_first
from .preprocessing_config import PreprocessingConfig
from .spool import SequenceSpool

logger = logging.getLogger(__name__)

SEQUENCE_BATCH = 1024


class PreprocessingError(Exception):
    pass


class Preprocessor:
    def __init__(self, preprocessing_config: PreprocessingConfig, database_config: DatabaseConfig):
        self.pcfg = preprocessing_config
        self.config = database_config

    def preprocess(self) -> Database:
        import os
        import tempfile

        t0 = time.time()
        pango_path = self.pcfg.pango_lineage_definition_path()
        alias_key = (
            PangoLineageAliasLookup.read_from_file(pango_path)
            if pango_path
            else PangoLineageAliasLookup()
        )
        reference_genomes = ReferenceGenomes.read_from_file(self.pcfg.reference_genome_path())

        # Sequence data streams through disk spools (spool.py) so peak RAM
        # stays ~= one partition's compressed blobs, never the raw corpus
        # (the reference's zstd-table pattern, preprocessor.cpp:255-333).
        spool_parent = self.pcfg.intermediate_results_directory
        with tempfile.TemporaryDirectory(
            prefix="silo_spool_",
            dir=spool_parent if os.path.isdir(spool_parent) else None,
        ) as tmpdir:
            if self.pcfg.ndjson_input_filename:
                rows, sequences, unaligned = self._load_ndjson(
                    reference_genomes, tmpdir)
            else:
                rows = self._load_metadata_tsv()
                sequences, unaligned = None, None

            db = self._build_database(
                rows, alias_key, reference_genomes, sequences, unaligned, tmpdir
            )
        db.data_version = DataVersion.mine()
        logger.info("preprocessing took %.1f s", time.time() - t0)
        return db

    # -- inputs ---------------------------------------------------------------

    def _load_metadata_tsv(self) -> list[dict]:
        header, rows = readers.read_tsv(self.pcfg.metadata_path())
        for metadata in self.config.schema.metadata:
            if metadata.name not in header:
                raise PreprocessingError(
                    f"The metadata field '{metadata.name}' which is contained in the database "
                    "config is not contained in the metadata file."
                )
        return rows

    def _load_ndjson(self, reference_genomes: ReferenceGenomes, tmpdir: str):
        """NDJSON line format (reference preprocessor.cpp:87-131):
        {metadata: {...}, alignedNucleotideSequences: {name: seq|null}, ...}

        Sequences go straight into single-partition disk spools keyed by
        global row id (spool.py) — only the metadata rows stay in RAM,
        mirroring the reference's zstd-compressed DuckDB sequence tables."""
        import json

        path = self.pcfg.ndjson_path()
        rows: list[dict] = []
        nuc_names = list(reference_genomes.raw_nucleotide_sequences)
        gene_names = list(reference_genomes.raw_aa_sequences)
        sequences: dict[tuple[str, str], SequenceSpool] = {}
        unaligned: dict[str, SequenceSpool] = {}
        for name in nuc_names:
            ref = reference_genomes.raw_nucleotide_sequences[name].encode("ascii")
            sequences[("nuc", name)] = SequenceSpool(tmpdir, f"g_nuc_{name}", 1, ref)
            unaligned[name] = SequenceSpool(tmpdir, f"g_unc_{name}", 1, ref)
        for name in gene_names:
            ref = reference_genomes.raw_aa_sequences[name].encode("ascii")
            sequences[("aa", name)] = SequenceSpool(tmpdir, f"g_aa_{name}", 1, ref)

        f = None
        for candidate in (path, path + ".zst", path + ".xz"):
            f = readers.open_text_stream(candidate, encoding="utf-8")
            if f is not None:
                break
        if f is None:
            raise PreprocessingError(f"The specified input file {path} does not exist.")
        with f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                record = json.loads(line)
                if not rows:
                    # Validate sequence keys vs reference genomes on the first
                    # record (reference sequence_info.cpp:80-130).
                    for field_name, expected in (
                        ("alignedNucleotideSequences", set(nuc_names)),
                        ("alignedAminoAcidSequences", set(gene_names)),
                    ):
                        got = set(record.get(field_name, {}))
                        missing = expected - got
                        if missing:
                            raise PreprocessingError(
                                f"The field '{field_name}' in the input file does not "
                                f"contain the sequences {sorted(missing)} required by "
                                "the reference genomes."
                            )
                metadata = dict(record.get("metadata", {}))
                # insertion lists -> comma-joined strings (metadata_info.cpp:62-97)
                nuc_ins = record.get("nucleotideInsertions", {})
                aa_ins = record.get("aminoAcidInsertions", {})
                # reference metadata_info.cpp:60-95: insertion lists flatten
                # to "<sequence>:<pos>:<value>" entries (always prefixed)
                for field in self.config.schema.metadata:
                    if field.type.value == "insertion" and field.name not in metadata:
                        parts = []
                        for seq_name in nuc_names:
                            for ins in nuc_ins.get(seq_name, []):
                                parts.append(f"{seq_name}:{ins}")
                        metadata[field.name] = ",".join(parts)
                    if field.type.value == "aaInsertion" and field.name not in metadata:
                        parts = []
                        for gene in gene_names:
                            for ins in aa_ins.get(gene, []):
                                parts.append(f"{gene}:{ins}")
                        metadata[field.name] = ",".join(parts)
                row_id = len(rows)
                rows.append(metadata)
                aligned = record.get("alignedNucleotideSequences", {})
                for name in nuc_names:
                    sequences[("nuc", name)].add(0, row_id, aligned.get(name))
                aligned_aa = record.get("alignedAminoAcidSequences", {})
                for name in gene_names:
                    sequences[("aa", name)].add(0, row_id, aligned_aa.get(name))
                unaligned_seqs = record.get("unalignedNucleotideSequences", {})
                for name in nuc_names:
                    unaligned[name].add(0, row_id, unaligned_seqs.get(name))
        for spool in (*sequences.values(), *unaligned.values()):
            spool.finish_writes()
        return rows, sequences, unaligned

    # -- build ----------------------------------------------------------------

    def _normalize(self, value) -> str:
        if value is None:
            return ""
        if isinstance(value, bool):
            return "true" if value else "false"
        return str(value)

    def _build_database(
        self,
        rows: list[dict],
        alias_key: PangoLineageAliasLookup,
        reference_genomes: ReferenceGenomes,
        ndjson_sequences=None,
        ndjson_unaligned=None,
        tmpdir: str | None = None,
    ) -> Database:
        config = self.config
        db = Database(config, alias_key, reference_genomes)

        # 1. Partition assignment (partitioner.py).
        partition_by = config.schema.partition_by
        if partition_by is not None:
            def key_of(row):
                value = self._normalize(row.get(partition_by))
                return value if value != "" else None

            counts: dict[object, int] = {}
            for row in rows:
                counts[key_of(row)] = counts.get(key_of(row), 0) + 1
            ordered_keys = sorted(counts.items(), key=lambda kv: sort_key_nulls_first(kv[0]))
            groups = partition_keys(ordered_keys)
            key_to_partition = {}
            for pid, group in enumerate(groups):
                for key in group:
                    key_to_partition[key] = pid
            n_partitions = len(groups)
            row_partition = [key_to_partition[key_of(row)] for row in rows]
        else:
            n_partitions = 1
            row_partition = [0] * len(rows)

        # 2. Row order within partitions: (date NULLS FIRST via 0-encoding,
        #    primary key).
        primary_key = config.schema.primary_key
        date_to_sort_by = config.schema.date_to_sort_by
        row_ids_per_partition: list[list[int]] = [[] for _ in range(n_partitions)]
        for i, pid in enumerate(row_partition):
            row_ids_per_partition[pid].append(i)

        def order_key(i):
            if date_to_sort_by is not None:
                date = string_to_date(self._normalize(rows[i].get(date_to_sort_by)))
                return (date, self._normalize(rows[i].get(primary_key)))
            return (self._normalize(rows[i].get(primary_key)),)

        for pid in range(n_partitions):
            row_ids_per_partition[pid].sort(key=order_key)

        # 3. Column skeletons with cross-partition dictionaries.
        pango_dicts = {}
        for metadata in config.schema.metadata:
            column_type = metadata.column_type()
            if column_type in (ColumnType.STRING, ColumnType.INDEXED_STRING,
                               ColumnType.NUC_INSERTION, ColumnType.AA_INSERTION):
                db.dictionaries[metadata.name] = Dictionary()
            elif column_type == ColumnType.INDEXED_PANGOLINEAGE:
                pango_dicts[metadata.name] = (Dictionary(), Dictionary())
                db.dictionaries[metadata.name] = pango_dicts[metadata.name]

        partitions = []
        for pid in range(n_partitions):
            row_ids = row_ids_per_partition[pid]
            partition = DatabasePartition(pid, len(row_ids))
            for metadata in config.schema.metadata:
                column_type = metadata.column_type()
                if column_type == ColumnType.STRING:
                    col = StringColumnPartition(db.dictionaries[metadata.name])
                elif column_type == ColumnType.INDEXED_STRING:
                    col = IndexedStringColumnPartition(db.dictionaries[metadata.name])
                elif column_type == ColumnType.DATE:
                    col = DateColumnPartition(metadata.name == date_to_sort_by)
                elif column_type == ColumnType.INT:
                    col = IntColumnPartition()
                elif column_type == ColumnType.FLOAT:
                    col = FloatColumnPartition()
                elif column_type == ColumnType.INDEXED_PANGOLINEAGE:
                    unaliased, aliased = pango_dicts[metadata.name]
                    col = PangoLineageColumnPartition(alias_key, unaliased, aliased)
                elif column_type == ColumnType.NUC_INSERTION:
                    col = InsertionColumnPartition(
                        db.dictionaries[metadata.name],
                        config.default_nucleotide_sequence,
                        NUCLEOTIDE,
                        "nuc_insertion",
                    )
                elif column_type == ColumnType.AA_INSERTION:
                    col = InsertionColumnPartition(
                        db.dictionaries[metadata.name], None, AMINO_ACID, "aa_insertion"
                    )
                else:
                    raise PreprocessingError(f"Unhandled column type {column_type}")
                partition.columns[metadata.name] = col

            # 4. Fill metadata columns in partition row order.
            for i in row_ids:
                row = rows[i]
                for metadata in config.schema.metadata:
                    partition.columns[metadata.name].insert(
                        self._normalize(row.get(metadata.name))
                    )
            for col in partition.columns.values():
                col.finalize()
            partitions.append(partition)
        db.partitions = partitions

        # 5. Sequence stores (dense bitplanes) + unaligned stores, streamed
        #    through per-partition disk spools: assignment maps global row id
        #    -> (partition, partition-local row), sequences flow spool ->
        #    SegmentIndexBuilder in SEQUENCE_BATCH batches, and raw genomes
        #    never accumulate in RAM (reference preprocessor.cpp:255-333).
        key_by_row = [self._normalize(row.get(primary_key)) for row in rows]
        assignment: list[tuple[int, int]] = [(0, 0)] * len(rows)
        for pid, row_ids in enumerate(row_ids_per_partition):
            for local_row, i in enumerate(row_ids):
                assignment[i] = (pid, local_row)

        def fill_segment(kind: str, name: str, reference_ids, spool: SequenceSpool):
            for pid, partition in enumerate(partitions):
                builder = SegmentIndexBuilder(
                    NUCLEOTIDE if kind == "nuc" else AMINO_ACID,
                    reference_ids,
                    partition.sequence_count,
                )
                batch: list[str | None] = []
                for seq in spool.iter_rows(pid, partition.sequence_count):
                    batch.append(seq)
                    if len(batch) >= SEQUENCE_BATCH:
                        builder.add_batch(batch)
                        batch = []
                if batch:
                    builder.add_batch(batch)
                segment = builder.finish()
                if kind == "nuc":
                    partition.nuc_sequences[name] = segment
                else:
                    partition.aa_sequences[name] = segment
            spool.cleanup()

        def spool_fasta(path_no_ext: str, tag: str, dictionary: bytes,
                        required_error: str | None) -> SequenceSpool | None:
            """Stream a FASTA file (keyed by primary key) into a per-
            partition spool; None if the file is absent and optional."""
            stream = readers.open_maybe_compressed(path_no_ext)
            if stream is None:
                if required_error is not None:
                    raise PreprocessingError(required_error)
                return None
            key_to_slot = {key_by_row[i]: assignment[i] for i in range(len(rows))}
            spool = SequenceSpool(tmpdir, tag, n_partitions, dictionary)
            with stream:
                for key, seq in readers.iter_fasta(stream):
                    slot = key_to_slot.get(key)
                    if slot is not None:
                        spool.add(slot[0], slot[1], seq)
            spool.finish_writes()
            return spool

        def routed(global_spool: SequenceSpool, tag: str) -> SequenceSpool:
            per_part = SequenceSpool(
                tmpdir, tag, n_partitions, global_spool.dictionary)
            global_spool.route(per_part, assignment)
            global_spool.cleanup()
            return per_part

        if ndjson_sequences is not None:
            for (kind, name), global_spool in ndjson_sequences.items():
                reference_ids = (
                    reference_genomes.nucleotide_ids[name]
                    if kind == "nuc"
                    else reference_genomes.aa_ids[name]
                )
                fill_segment(kind, name, reference_ids,
                             routed(global_spool, f"r_{kind}_{name}"))
        else:
            for name, reference_ids in reference_genomes.nucleotide_ids.items():
                ref = reference_genomes.raw_nucleotide_sequences[name].encode("ascii")
                spool = spool_fasta(
                    self.pcfg.nuc_filename_no_extension(name), f"r_nuc_{name}", ref,
                    f"Missing aligned nucleotide sequence file for '{name}'",
                )
                fill_segment("nuc", name, reference_ids, spool)
            for name, reference_ids in reference_genomes.aa_ids.items():
                ref = reference_genomes.raw_aa_sequences[name].encode("ascii")
                spool = spool_fasta(
                    self.pcfg.gene_filename_no_extension(name), f"r_aa_{name}", ref,
                    f"Missing gene sequence file for '{name}'",
                )
                fill_segment("aa", name, reference_ids, spool)

        # Unaligned nucleotide sequences (lazy store for the Fasta action):
        # blobs move spool -> store verbatim (same zstd dictionary).
        for name, reference in reference_genomes.raw_nucleotide_sequences.items():
            ref = reference.encode("ascii")
            if ndjson_unaligned is not None:
                spool = routed(ndjson_unaligned[name], f"r_unc_{name}")
            else:
                spool = spool_fasta(
                    self.pcfg.unaligned_nuc_filename_no_extension(name),
                    f"r_unc_{name}", ref, None,
                )
            stores = []
            for pid, partition in enumerate(partitions):
                store = UnalignedPartitionStore(reference)
                blobs = spool.read_partition(pid) if spool is not None else {}
                for local_row in range(partition.sequence_count):
                    store.add_compressed(blobs.get(local_row))
                stores.append(store)
            if spool is not None:
                spool.cleanup()
            db.unaligned_nuc_sequences[name] = stores

        for partition in partitions:
            partition.validate()
        return db
