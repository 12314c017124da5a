"""Conformance: the reference's end-to-end query corpus, bit-for-bit.

Runs every case from /root/reference/endToEndTests/test/queries (expected
200 + exact result rows) and .../invalidQueries (expected 400 + exact error
message) against the engine. This is the north-star acceptance suite
(reference endToEndTests/test/query.test.js).
"""

import json
import math
import os

import pytest

from lapis_silo_tpu.query.errors import QueryParseError

from .conftest import REFERENCE_ROOT, reference_available

QUERIES_DIR = os.path.join(REFERENCE_ROOT, "endToEndTests/test/queries")
INVALID_DIR = os.path.join(REFERENCE_ROOT, "endToEndTests/test/invalidQueries")


def _cases(directory):
    if not reference_available():
        return []
    return sorted(os.listdir(directory))


def deep_equal(expected, actual, path=""):
    """Order-sensitive deep equality with float tolerance (doubles go
    through two JSON serializations)."""
    if isinstance(expected, float) or isinstance(actual, float):
        assert isinstance(actual, (int, float)) and isinstance(expected, (int, float)), (
            path, expected, actual)
        assert math.isclose(expected, actual, rel_tol=1e-12, abs_tol=1e-15), (
            path, expected, actual)
        return
    if isinstance(expected, dict):
        assert isinstance(actual, dict), (path, expected, actual)
        assert set(expected) == set(actual), (path, set(expected), set(actual))
        for key in expected:
            deep_equal(expected[key], actual[key], f"{path}.{key}")
        return
    if isinstance(expected, list):
        assert isinstance(actual, list), (path, expected, actual)
        assert len(expected) == len(actual), (path, len(expected), len(actual))
        for i, (e, a) in enumerate(zip(expected, actual)):
            deep_equal(e, a, f"{path}[{i}]")
        return
    assert expected == actual, (path, expected, actual)


@pytest.mark.parametrize("case_file", _cases(QUERIES_DIR))
def test_query_case(example_dataset_db, case_file):
    with open(os.path.join(QUERIES_DIR, case_file)) as f:
        case = json.load(f)
    response = example_dataset_db.execute_query(json.dumps(case["query"]))
    deep_equal({"queryResult": case["expectedQueryResult"]}, response, case_file)


@pytest.mark.parametrize("case_file", _cases(INVALID_DIR))
def test_invalid_query_case(example_dataset_db, case_file):
    with open(os.path.join(INVALID_DIR, case_file)) as f:
        case = json.load(f)
    with pytest.raises(QueryParseError) as excinfo:
        example_dataset_db.execute_query(json.dumps(case["query"]))
    assert str(excinfo.value) == case["expectedError"]["message"], case_file
