"""Sharded multi-process ingest (preprocessing/sharded.py): N worker
processes splitting the sequence work by partition must converge to the
SAME database as the single-process pipeline — pinned by replaying the
full conformance corpus against the sharded build."""

import json
import os

import pytest

from .conftest import REFERENCE_ROOT, reference_available

QUERIES_DIR = os.path.join(REFERENCE_ROOT, "endToEndTests/test/queries")


@pytest.fixture(scope="module")
def sharded_db(tmp_path_factory):
    if not reference_available():
        pytest.skip("reference test data not available")
    from lapis_silo_tpu.config.database_config import get_validated_config
    from lapis_silo_tpu.preprocessing.preprocessing_config import (
        PreprocessingConfig,
    )
    from lapis_silo_tpu.preprocessing.sharded import sharded_preprocess

    from .test_ndjson_path import _generate_ndjson

    base = os.path.join(REFERENCE_ROOT, "testBaseData/exampleDataset/")
    work = tmp_path_factory.mktemp("sharded_ndjson_input")
    _generate_ndjson(base, str(work / "input_file.ndjson"))
    for name in ("reference_genomes.json", "pangolineage_alias.json"):
        (work / name).write_bytes(open(os.path.join(base, name), "rb").read())
    pcfg = PreprocessingConfig(
        input_directory=str(work),
        ndjson_input_filename="input_file.ndjson",
        pango_lineage_definition_filename="pangolineage_alias.json",
    )
    dbconf = get_validated_config(os.path.join(base, "database_config.yaml"))
    return sharded_preprocess(pcfg, dbconf, n_shards=3)


def test_sharded_conformance(sharded_db):
    """The 94-case corpus (counts, Mutations, Details, Fasta, insertions)
    deep-equal through the 3-shard build — covers segment bitplanes,
    unaligned stores, and the metadata columns the coordinator built."""
    from .test_conformance import deep_equal

    for case_file in sorted(os.listdir(QUERIES_DIR)):
        with open(os.path.join(QUERIES_DIR, case_file)) as f:
            case = json.load(f)
        response = sharded_db.execute_query(json.dumps(case["query"]))
        deep_equal({"queryResult": case["expectedQueryResult"]}, response,
                   case_file)


def test_sharded_matches_single_process_info(sharded_db):
    """/info numbers are index-content-determined: byte-exact equality
    with the single-process path proves identical bitplane layouts."""
    info = sharded_db.info()
    assert info["sequenceCount"] == 100
    assert info["totalSize"] == 26335659
    assert info["nBitmapsSize"] == 3898


def test_sharded_rejects_tsv():
    from lapis_silo_tpu.preprocessing.preprocessing_config import (
        PreprocessingConfig,
    )
    from lapis_silo_tpu.preprocessing.preprocessor import PreprocessingError
    from lapis_silo_tpu.preprocessing.sharded import sharded_preprocess

    pcfg = PreprocessingConfig(input_directory=".",
                               metadata_filename="m.tsv")
    with pytest.raises(PreprocessingError, match="NDJSON input only"):
        sharded_preprocess(pcfg, None, 2)
