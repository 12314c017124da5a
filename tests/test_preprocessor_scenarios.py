"""Tier-2 integration scenarios (reference preprocessor.test.cpp): full
pipeline over the four special-case corpora, exact query results."""

import json
import os

import pytest

from .conftest import REFERENCE_ROOT, reference_available

SCENARIOS = [
    (
        "fastaFilesWithMissingSequences",
        2,
        {
            "action": {
                "type": "FastaAligned",
                "sequenceName": ["someShortGene", "secondSegment"],
                "orderByFields": ["accessionVersion"],
            },
            "filterExpression": {"type": "True"},
        },
        [
            {"accessionVersion": "1.1", "someShortGene": "MADS",
             "secondSegment": "NNNNNNNNNNNNNNNN"},
            {"accessionVersion": "1.3", "someShortGene": "XXXX",
             "secondSegment": "NNNNNNNNNNNNNNNN"},
        ],
    ),
    (
        "ndjsonWithNullSequences",
        2,
        {
            "action": {
                "type": "FastaAligned",
                "sequenceName": ["someShortGene", "secondSegment"],
                "orderByFields": ["accessionVersion"],
            },
            "filterExpression": {"type": "True"},
        },
        [
            {"accessionVersion": "1.1", "someShortGene": "MADS",
             "secondSegment": "NNNNNNNNNNNNNNNN"},
            {"accessionVersion": "1.3", "someShortGene": "XXXX",
             "secondSegment": "NNNNNNNNNNNNNNNN"},
        ],
    ),
    (
        "ndjsonWithSqlKeywordField",
        2,
        {
            "action": {"type": "Aggregated", "groupByFields": ["group"],
                       "orderByFields": ["group"]},
            "filterExpression": {"type": "True"},
        },
        [
            {"count": 1, "group": None},
            {"count": 1, "group": "dummyValue"},
        ],
    ),
    (
        "tsvWithSqlKeywordField",
        2,
        {
            "action": {"type": "Aggregated", "groupByFields": ["group"],
                       "orderByFields": ["group"]},
            "filterExpression": {"type": "True"},
        },
        [
            {"count": 1, "group": None},
            {"count": 1, "group": "dummyValue"},
        ],
    ),
]


@pytest.mark.parametrize("directory,expected_count,query,expected", SCENARIOS,
                         ids=[s[0] for s in SCENARIOS])
def test_scenario(directory, expected_count, query, expected):
    if not reference_available():
        pytest.skip("reference test data not available")
    from lapis_silo_tpu.config.database_config import get_validated_config
    from lapis_silo_tpu.preprocessing.preprocessing_config import (
        read_preprocessing_config,
    )
    from lapis_silo_tpu.preprocessing.preprocessor import Preprocessor

    base = os.path.join(REFERENCE_ROOT, "testBaseData", directory)
    pcfg = read_preprocessing_config(os.path.join(base, "preprocessing_config.yaml"))
    pcfg.input_directory = base
    dbconf = get_validated_config(os.path.join(base, "database_config.yaml"))
    db = Preprocessor(pcfg, dbconf).preprocess()

    assert db.info()["sequenceCount"] == expected_count
    assert db.info()["totalSize"] > 0

    response = db.execute_query(json.dumps(query))
    assert response["queryResult"] == expected
