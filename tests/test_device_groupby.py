"""Device group-by fast path (segment-sum over cached group codes) must
match the host path exactly — values, null decoding, AND row order (the
corpus pins pre-sort order for tie groups)."""

import json

import pytest

from .conftest import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference test data not available"
)

CASES = [
    {"filterExpression": {"type": "True"},
     "action": {"type": "Aggregated", "groupByFields": ["country", "division"]}},
    {"filterExpression": {"type": "True"},
     "action": {"type": "Aggregated", "groupByFields": ["date"]}},
    {"filterExpression": {"type": "NucleotideEquals", "position": 241, "symbol": "T"},
     "action": {"type": "Aggregated", "groupByFields": ["age"]}},
    {"filterExpression": {"type": "True"},
     "action": {"type": "Aggregated", "groupByFields": ["qc_value"]}},
    {"filterExpression": {"type": "True"},
     "action": {"type": "Aggregated", "groupByFields": ["pango_lineage", "region"],
                "orderByFields": ["count"], "limit": 5, "offset": 2}},
    {"filterExpression": {"type": "False"},
     "action": {"type": "Aggregated", "groupByFields": ["country"]}},
]


@pytest.mark.parametrize("case", CASES,
                         ids=lambda c: ",".join(c["action"]["groupByFields"]))
def test_device_groupby_matches_host(example_dataset_db, case):
    from lapis_silo_tpu.query.engine import QueryEngine

    q = json.dumps(case)
    dev = QueryEngine(example_dataset_db, use_device=True).execute(q)
    host = QueryEngine(example_dataset_db, use_device=False).execute(q)
    assert dev == host


def test_device_groupby_used(example_dataset_db):
    from lapis_silo_tpu.query.engine import QueryEngine

    engine = QueryEngine(example_dataset_db, use_device=True)
    engine.execute(json.dumps(CASES[0]))
    cache = engine._device_engine._filter_cache
    assert ("group_codes", ("country", "division")) in cache


def test_float_groupby_canonicalization():
    """-0.0 must merge with 0.0 and all NaNs must form ONE null group —
    the device path groups by bit pattern and must canonicalize first."""
    import numpy as np

    from lapis_silo_tpu.config.database_config import Metadata, ValueType
    from lapis_silo_tpu.query.engine import QueryEngine
    from lapis_silo_tpu.storage.columns import FloatColumnPartition
    from lapis_silo_tpu.testing import synthetic_database

    db = synthetic_database(n_rows=64, length=128, n_partitions=1)
    col = FloatColumnPartition()
    nan2 = np.frombuffer(np.uint64(0x7FF8000000000001).tobytes(), np.float64)[0]
    col.values = np.array([0.0, -0.0, np.nan, nan2] * 16, dtype=np.float64)
    db.partitions[0].columns["qcf"] = col
    db.config.schema.metadata.append(Metadata("qcf", ValueType.FLOAT))

    q = json.dumps({"filterExpression": {"type": "True"},
                    "action": {"type": "Aggregated", "groupByFields": ["qcf"]}})
    dev = QueryEngine(db, use_device=True).execute(q)
    host = QueryEngine(db, use_device=False).execute(q)
    assert dev == host
    assert dev == {"queryResult": [{"qcf": 0.0, "count": 32},
                                   {"qcf": None, "count": 32}]}
