"""exampleDataset1000Sequences: compressed NDJSON ingest at 10x corpus size."""

import json
import os

import pytest

from .conftest import REFERENCE_ROOT, reference_available

BASE = os.path.join(REFERENCE_ROOT, "testBaseData/exampleDataset1000Sequences/")


@pytest.fixture(scope="module")
def db_1000():
    if not reference_available() or not os.path.exists(BASE):
        pytest.skip("dataset unavailable")
    from lapis_silo_tpu.config.database_config import get_validated_config
    from lapis_silo_tpu.preprocessing.preprocessing_config import (
        read_preprocessing_config,
    )
    from lapis_silo_tpu.preprocessing.preprocessor import Preprocessor

    pcfg = read_preprocessing_config(BASE + "preprocessing_config.yaml")
    pcfg.input_directory = BASE
    dbconf = get_validated_config(BASE + "database_config.yaml")
    return Preprocessor(pcfg, dbconf).preprocess()


def test_counts_and_groupby(db_1000):
    assert db_1000.info()["sequenceCount"] == 1000
    result = db_1000.execute_query(json.dumps({
        "action": {"type": "Aggregated", "groupByFields": ["pangoLineage"],
                   "orderByFields": [{"field": "count", "order": "descending"},
                                     "pangoLineage"],
                   "limit": 2},
        "filterExpression": {"type": "True"},
    }))
    assert result["queryResult"][0] == {"pangoLineage": "D.2", "count": 515}
    assert result["queryResult"][1] == {"pangoLineage": "A.2.2", "count": 147}


def test_mutations(db_1000):
    result = db_1000.execute_query(json.dumps({
        "action": {"type": "Mutations", "minProportion": 0.5,
                   "orderByFields": ["mutation"], "limit": 1},
        "filterExpression": {"type": "True"},
    }))
    assert result["queryResult"][0]["mutation"] == "A1-"
    assert result["queryResult"][0]["count"] == 988
