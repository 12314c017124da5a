"""Snapshot round-trip of a corpus WITH null sequences (all-missing rows),
including FastaAligned reconstruction after reload."""

import json
import os

import pytest

from .conftest import REFERENCE_ROOT, reference_available

BASE = os.path.join(REFERENCE_ROOT, "testBaseData/ndjsonWithNullSequences")


def test_null_sequence_snapshot_roundtrip(tmp_path):
    if not reference_available():
        pytest.skip("reference data unavailable")
    from lapis_silo_tpu.config.database_config import get_validated_config
    from lapis_silo_tpu.preprocessing.preprocessing_config import (
        read_preprocessing_config,
    )
    from lapis_silo_tpu.preprocessing.preprocessor import Preprocessor
    from lapis_silo_tpu.storage.snapshot import load_database, save_database

    pcfg = read_preprocessing_config(os.path.join(BASE, "preprocessing_config.yaml"))
    pcfg.input_directory = BASE
    dbconf = get_validated_config(os.path.join(BASE, "database_config.yaml"))
    db = Preprocessor(pcfg, dbconf).preprocess()
    loaded = load_database(save_database(db, str(tmp_path)))

    query = json.dumps({
        "action": {"type": "FastaAligned",
                   "sequenceName": ["someShortGene", "secondSegment"],
                   "orderByFields": ["accessionVersion"]},
        "filterExpression": {"type": "True"},
    })
    assert loaded.execute_query(query) == db.execute_query(query)
    assert loaded.execute_query(query)["queryResult"][0]["secondSegment"] == "N" * 16
