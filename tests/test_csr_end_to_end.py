"""Force CSR-of-words row storage on the exampleDataset corpus and check
query results are identical to the dense-built database (all action types,
device + host paths, snapshot roundtrip)."""

import json
import os

import pytest

from .conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference test data not available"
)

QUERIES = [
    {"filterExpression": {"type": "True"}, "action": {"type": "Aggregated"}},
    {"filterExpression": {"type": "NucleotideEquals", "position": 25, "symbol": "T"},
     "action": {"type": "Aggregated", "groupByFields": ["country"],
                "orderByFields": ["country"]}},
    {"filterExpression": {"type": "HasNucleotideMutation", "position": 241},
     "action": {"type": "Details", "fields": ["country", "date"],
                "orderByFields": ["date"], "limit": 7}},
    {"filterExpression": {"type": "True"},
     "action": {"type": "Mutations", "minProportion": 0.05}},
    {"filterExpression": {"type": "True"},
     "action": {"type": "AminoAcidMutations", "minProportion": 0.2}},
    {"filterExpression": {"type": "StringEquals", "column": "country",
                          "value": "Switzerland"},
     "action": {"type": "FastaAligned", "sequenceName": ["main"],
                "orderByFields": ["gisaid_epi_isl"], "limit": 3}},
    {"filterExpression": {"type": "Maybe", "child": {
        "type": "NucleotideEquals", "position": 26, "symbol": "A"}},
     "action": {"type": "Aggregated"}},
    {"filterExpression": {"type": "N-Of", "numberOfMatchers": 2,
                          "matchExactly": False, "children": [
         {"type": "NucleotideEquals", "position": 241, "symbol": "T"},
         {"type": "NucleotideEquals", "position": 3037, "symbol": "T"},
         {"type": "NucleotideEquals", "position": 14408, "symbol": "T"}]},
     "action": {"type": "Aggregated"}},
]


@pytest.fixture(scope="module")
def csr_db(monkeypatch_module):
    import lapis_silo_tpu.storage.segment as segment_mod
    from lapis_silo_tpu.config.database_config import get_validated_config
    from lapis_silo_tpu.preprocessing.preprocessing_config import (
        read_preprocessing_config,
    )
    from lapis_silo_tpu.preprocessing.preprocessor import Preprocessor

    monkeypatch_module.setattr(segment_mod, "CSR_MIN_WORDS", 1)
    base = os.path.join(REFERENCE_ROOT, "testBaseData/exampleDataset/")
    dbconf = get_validated_config(base + "database_config.yaml")
    pcfg = read_preprocessing_config(base + "preprocessing_config.yaml")
    pcfg.input_directory = base
    db = Preprocessor(pcfg, dbconf).preprocess()
    for partition in db.partitions:
        for seg in list(partition.nuc_sequences.values()) + list(
            partition.aa_sequences.values()
        ):
            assert seg.store.kind == "csr"
    return db


@pytest.fixture(scope="module")
def monkeypatch_module():
    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    yield mp
    mp.undo()


@pytest.mark.parametrize("query", QUERIES,
                         ids=lambda q: q["action"]["type"])
def test_csr_matches_dense(example_dataset_db, csr_db, query):
    q = json.dumps(query)
    assert csr_db.execute_query(q) == example_dataset_db.execute_query(q)


def test_csr_snapshot_roundtrip(csr_db, tmp_path):
    from lapis_silo_tpu.storage import snapshot

    d = snapshot.save_database(csr_db, str(tmp_path))
    db2 = snapshot.load_database(d)
    for partition in db2.partitions:
        seg = partition.nuc_sequences["main"]
        assert seg.store.kind == "csr"
    q = json.dumps(QUERIES[3])
    assert db2.execute_query(q) == csr_db.execute_query(q)


def test_csr_info_matches_dense(example_dataset_db, csr_db):
    assert csr_db.info() == example_dataset_db.info()
    assert csr_db.detailed_info() == example_dataset_db.detailed_info()
