"""NDJSON ingest path: must converge to identical query results as the
TSV+FASTA path (reference CI runs the e2e suite against both)."""

import json
import os

import pytest

from .conftest import REFERENCE_ROOT, reference_available

QUERIES_DIR = os.path.join(REFERENCE_ROOT, "endToEndTests/test/queries")


def _generate_ndjson(base: str, out_path: str):
    """Rebuild the exampleDataset as NDJSON records (the reference's
    exampleDatasetAsNdjson input is generated the same way in its CI)."""
    from lapis_silo_tpu.preprocessing import readers

    header, rows = readers.read_tsv(os.path.join(base, "small_metadata_set.tsv"))
    with open(os.path.join(base, "reference_genomes.json")) as f:
        ref = json.load(f)
    nuc_names = [e["name"] for e in ref["nucleotideSequences"]]
    gene_names = [e["name"] for e in ref["genes"]]
    aligned = {
        name: readers.read_fasta_file(os.path.join(base, f"nuc_{name}")) or {}
        for name in nuc_names
    }
    genes = {
        name: readers.read_fasta_file(os.path.join(base, f"gene_{name}")) or {}
        for name in gene_names
    }
    unaligned = {
        name: readers.read_fasta_file(os.path.join(base, f"unaligned_{name}")) or {}
        for name in nuc_names
    }
    with open(out_path, "w") as f:
        for row in rows:
            key = row["gisaid_epi_isl"]
            nuc_ins: dict = {name: [] for name in nuc_names}
            for entry in (row.get("nucleotideInsertions") or "").split(","):
                if entry:
                    nuc_ins["main"].append(entry)
            aa_ins: dict = {name: [] for name in gene_names}
            for entry in (row.get("aminoAcidInsertions") or "").split(","):
                if entry:
                    gene, rest = entry.split(":", 1)
                    aa_ins[gene].append(rest)
            metadata = {
                k: (v if v != "" else None)
                for k, v in row.items()
                if k not in ("nucleotideInsertions", "aminoAcidInsertions")
            }
            metadata["age"] = int(row["age"]) if row.get("age") else None
            metadata["qc_value"] = float(row["qc_value"]) if row.get("qc_value") else None
            record = {
                "metadata": metadata,
                "alignedNucleotideSequences": {
                    name: aligned[name].get(key) for name in nuc_names
                },
                "alignedAminoAcidSequences": {
                    name: genes[name].get(key) for name in gene_names
                },
                "unalignedNucleotideSequences": {
                    name: unaligned[name].get(key) for name in nuc_names
                },
                "nucleotideInsertions": nuc_ins,
                "aminoAcidInsertions": aa_ins,
            }
            f.write(json.dumps(record) + "\n")


@pytest.fixture(scope="session")
def ndjson_db(tmp_path_factory):
    if not reference_available():
        pytest.skip("reference test data not available")
    from lapis_silo_tpu.config.database_config import get_validated_config
    from lapis_silo_tpu.preprocessing.preprocessing_config import PreprocessingConfig
    from lapis_silo_tpu.preprocessing.preprocessor import Preprocessor

    base = os.path.join(REFERENCE_ROOT, "testBaseData/exampleDataset/")
    work = tmp_path_factory.mktemp("ndjson_input")
    _generate_ndjson(base, str(work / "input_file.ndjson"))
    for name in ("reference_genomes.json", "pangolineage_alias.json"):
        (work / name).write_bytes(open(os.path.join(base, name), "rb").read())
    pcfg = PreprocessingConfig(
        input_directory=str(work),
        ndjson_input_filename="input_file.ndjson",
        pango_lineage_definition_filename="pangolineage_alias.json",
    )
    dbconf = get_validated_config(os.path.join(base, "database_config.yaml"))
    return Preprocessor(pcfg, dbconf).preprocess()


def test_ndjson_conformance(ndjson_db):
    from .test_conformance import deep_equal

    for case_file in sorted(os.listdir(QUERIES_DIR)):
        with open(os.path.join(QUERIES_DIR, case_file)) as f:
            case = json.load(f)
        response = ndjson_db.execute_query(json.dumps(case["query"]))
        deep_equal({"queryResult": case["expectedQueryResult"]}, response, case_file)
