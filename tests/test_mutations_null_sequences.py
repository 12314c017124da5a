"""Mutations semantics on corpora with NULL (all-missing) sequences.

The reference reconstructs the deleted (most numerous) symbol's count as
|filter| minus the missing-bitmap correction minus all other symbols'
counts (ref: src/silo/query_engine/actions/mutations.cpp:70-100 mixed path,
:101-137 full path) — algebraically exactly |filter ∩ rows-with-symbol|,
with null rows (missing bitmap = addRange(0, L)) subtracted like any other
missing row. This test pins that equivalence with a brute-force oracle over
the raw NDJSON genomes, on the one corpus shape where layouts could
plausibly diverge (nulls + per-gene nulls).
"""

import json
import math
import os

import pytest

from .conftest import REFERENCE_ROOT, reference_available

BASE = os.path.join(REFERENCE_ROOT, "testBaseData/ndjsonWithNullSequences")


@pytest.fixture(scope="module")
def null_db():
    if not reference_available():
        pytest.skip("reference data unavailable")
    from lapis_silo_tpu.config.database_config import get_validated_config
    from lapis_silo_tpu.preprocessing.preprocessing_config import (
        read_preprocessing_config,
    )
    from lapis_silo_tpu.preprocessing.preprocessor import Preprocessor

    pcfg = read_preprocessing_config(os.path.join(BASE, "preprocessing_config.yaml"))
    pcfg.input_directory = BASE
    dbconf = get_validated_config(os.path.join(BASE, "database_config.yaml"))
    return Preprocessor(pcfg, dbconf).preprocess()


def _raw_genomes(kind: str, name: str) -> list:
    rows = [json.loads(line)
            for line in open(os.path.join(BASE, "input_file.ndjson"))]
    return [r[kind][name] for r in rows]


def _oracle_mutations(genomes, reference, alphabet, min_proportion=0.0):
    """Reference emit semantics (mutations.cpp addMutationsToOutput) from
    raw genome strings; null genomes contribute to no symbol."""
    length = len(reference)
    valid = alphabet.valid_mutation_chars
    out = []
    for pos in range(length):
        counts = {c: 0 for c in valid}
        for g in genomes:
            if g is None:
                continue
            ch = g[pos]
            if ch in counts:
                counts[ch] += 1
        total = sum(counts.values())
        if total == 0:
            continue
        threshold = (0 if min_proportion == 0
                     else int(math.ceil(total * min_proportion) - 1))
        ref_char = reference[pos]
        for ch in valid:
            if ch == ref_char:
                continue
            count = counts[ch]
            if count > threshold:
                out.append({
                    "mutation": f"{ref_char}{pos + 1}{ch}",
                    "mutationFrom": None,  # placeholder, removed below
                    "proportion": count / total,
                    "count": count,
                })
    for row in out:
        row.pop("mutationFrom")
    return out


def _norm(rows):
    return sorted(rows, key=lambda r: json.dumps(r, sort_keys=True))


def test_nuc_mutations_with_nulls(null_db):
    from lapis_silo_tpu.common.symbols import NUCLEOTIDE

    refs = json.load(open(os.path.join(BASE, "reference_genomes.json")))
    reference = {s["name"]: s["sequence"]
                 for s in refs["nucleotideSequences"]}["main"]
    genomes = _raw_genomes("alignedNucleotideSequences", "main")
    expected = _oracle_mutations(genomes, reference, NUCLEOTIDE)
    for row in expected:
        row["sequenceName"] = "main"

    result = null_db.execute_query(json.dumps({
        "action": {"type": "Mutations", "minProportion": 0},
        "filterExpression": {"type": "True"},
    }))["queryResult"]
    assert _norm(result) == _norm(expected)


def test_aa_mutations_with_nulls(null_db):
    from lapis_silo_tpu.common.symbols import AMINO_ACID

    refs = json.load(open(os.path.join(BASE, "reference_genomes.json")))
    gene_refs = {g["name"]: g["sequence"] for g in refs["genes"]}
    expected = []
    for gene, reference in gene_refs.items():
        genomes = _raw_genomes("alignedAminoAcidSequences", gene)
        rows = _oracle_mutations(genomes, reference, AMINO_ACID)
        for row in rows:
            row["sequenceName"] = gene
        expected.extend(rows)

    result = null_db.execute_query(json.dumps({
        "action": {"type": "AminoAcidMutations", "minProportion": 0},
        "filterExpression": {"type": "True"},
    }))["queryResult"]
    assert _norm(result) == _norm(expected)


def test_nuc_mutations_with_nulls_filtered(null_db):
    """Mixed-path (partial filter) equivalence: filter to a subset that
    still includes a null row."""
    from lapis_silo_tpu.common.symbols import NUCLEOTIDE

    refs = json.load(open(os.path.join(BASE, "reference_genomes.json")))
    reference = {s["name"]: s["sequence"]
                 for s in refs["nucleotideSequences"]}["main"]
    rows = [json.loads(line)
            for line in open(os.path.join(BASE, "input_file.ndjson"))]
    keep_versions = {"1.1", "1.3"}  # 1.3 has null aligned main
    genomes = [r["alignedNucleotideSequences"]["main"] for r in rows
               if r["metadata"]["accessionVersion"] in keep_versions]
    assert any(g is None for g in genomes)
    expected = _oracle_mutations(genomes, reference, NUCLEOTIDE)
    for row in expected:
        row["sequenceName"] = "main"

    filter_expr = {"type": "Or", "children": [
        {"type": "StringEquals", "column": "accessionVersion", "value": v}
        for v in sorted(keep_versions)]}
    result = null_db.execute_query(json.dumps({
        "action": {"type": "Mutations", "minProportion": 0},
        "filterExpression": filter_expr,
    }))["queryResult"]
    assert _norm(result) == _norm(expected)
