"""Resumable preprocessing: a crashed ingest restarts from the last
committed stage manifest instead of from zero (reference analog: the
file-backed ingest DuckDB, preprocessing_database.cpp:39)."""

import json
import os

import pytest

from .conftest import REFERENCE_ROOT, reference_available
from .test_conformance import deep_equal

QUERIES_DIR = os.path.join(REFERENCE_ROOT, "endToEndTests/test/queries")


def _tsv_configs(tmp_path):
    from lapis_silo_tpu.config.database_config import get_validated_config
    from lapis_silo_tpu.preprocessing.preprocessing_config import (
        read_preprocessing_config,
    )

    base = os.path.join(REFERENCE_ROOT, "testBaseData/exampleDataset/")
    dbconf = get_validated_config(base + "database_config.yaml")
    pcfg = read_preprocessing_config(base + "preprocessing_config.yaml")
    pcfg.input_directory = base
    pcfg.intermediate_results_directory = str(tmp_path / "intermediates")
    return pcfg, dbconf


def _ndjson_configs(tmp_path):
    from lapis_silo_tpu.config.database_config import get_validated_config
    from lapis_silo_tpu.preprocessing.preprocessing_config import (
        PreprocessingConfig,
    )

    from .test_ndjson_path import _generate_ndjson

    base = os.path.join(REFERENCE_ROOT, "testBaseData/exampleDataset/")
    work = tmp_path / "input"
    work.mkdir()
    _generate_ndjson(base, str(work / "input_file.ndjson"))
    for name in ("reference_genomes.json", "pangolineage_alias.json"):
        (work / name).write_bytes(
            open(os.path.join(base, name), "rb").read())
    pcfg = PreprocessingConfig(
        input_directory=str(work),
        ndjson_input_filename="input_file.ndjson",
        pango_lineage_definition_filename="pangolineage_alias.json",
        intermediate_results_directory=str(tmp_path / "intermediates"),
    )
    dbconf = get_validated_config(os.path.join(base, "database_config.yaml"))
    return pcfg, dbconf


def _check_corpus_sample(db):
    for case_file in ("And.json", "DetailsOrderByLimit.json",
                      "GroupByLineageOrderByCountLimit.json"):
        with open(os.path.join(QUERIES_DIR, case_file)) as f:
            case = json.load(f)
        response = db.execute_query(json.dumps(case["query"]))
        deep_equal({"queryResult": case["expectedQueryResult"]},
                   response, case_file)


@pytest.mark.skipif(not reference_available(), reason="no reference data")
def test_tsv_crash_resume(tmp_path, monkeypatch):
    """Crash after the first FASTA stage committed; the re-run skips the
    committed stages and still produces a corpus-exact database."""
    from lapis_silo_tpu.preprocessing import readers
    from lapis_silo_tpu.preprocessing.preprocessor import Preprocessor

    pcfg, dbconf = _tsv_configs(tmp_path)

    real_iter = readers.iter_fasta
    baseline = {"n": 0}

    def baseline_iter(stream):
        baseline["n"] += 1
        return real_iter(stream)

    # baseline: how many FASTA reads a full, non-resumable build performs
    monkeypatch.setenv("SILO_RESUME", "0")
    monkeypatch.setattr(readers, "iter_fasta", baseline_iter)
    Preprocessor(pcfg, dbconf).preprocess()
    monkeypatch.delenv("SILO_RESUME")
    assert baseline["n"] >= 3

    calls = {"n": 0}

    def crashing_iter(stream):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash mid-ingest")
        return real_iter(stream)

    monkeypatch.setattr(readers, "iter_fasta", crashing_iter)
    with pytest.raises(RuntimeError, match="simulated crash"):
        Preprocessor(pcfg, dbconf).preprocess()
    workdirs = os.listdir(pcfg.intermediate_results_directory)
    assert len(workdirs) == 1
    committed = [f for f in os.listdir(
        os.path.join(pcfg.intermediate_results_directory, workdirs[0]))
        if f.endswith(".stage.json")]
    assert any(f.startswith("scan") for f in committed)
    assert any(f.startswith("fasta_") for f in committed)

    # resume: the committed FASTA must NOT be re-read (its iter_fasta call
    # is skipped), and the result must match the pinned corpus
    resumed_calls = {"n": 0}

    def counting_iter(stream):
        resumed_calls["n"] += 1
        return real_iter(stream)

    monkeypatch.setattr(readers, "iter_fasta", counting_iter)
    db = Preprocessor(pcfg, dbconf).preprocess()
    # exactly the one committed FASTA is skipped on resume
    assert resumed_calls["n"] == baseline["n"] - 1
    _check_corpus_sample(db)
    # success clears the resume workdir
    assert os.listdir(pcfg.intermediate_results_directory) == []


@pytest.mark.skipif(not reference_available(), reason="no reference data")
def test_ndjson_crash_resume_skips_scan(tmp_path, monkeypatch):
    """NDJSON: crash during per-segment routing, after the scan stage
    committed. The re-run must NOT re-scan the input (the scanner factory
    is poisoned to prove it) and must still be corpus-exact."""
    from lapis_silo_tpu.preprocessing import spool as spool_mod
    from lapis_silo_tpu.preprocessing.preprocessor import Preprocessor

    pcfg, dbconf = _ndjson_configs(tmp_path)

    real_route = spool_mod.SequenceSpool.route
    calls = {"n": 0}

    def crashing_route(self, target, assignment):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash mid-route")
        return real_route(self, target, assignment)

    monkeypatch.setattr(spool_mod.SequenceSpool, "route", crashing_route)
    with pytest.raises(RuntimeError, match="simulated crash"):
        Preprocessor(pcfg, dbconf).preprocess()
    monkeypatch.setattr(spool_mod.SequenceSpool, "route", real_route)

    def poisoned_scanner(self, reference_genomes):
        raise AssertionError("scan ran again despite committed scan stage")

    monkeypatch.setattr(Preprocessor, "_make_ndjson_scanner",
                        poisoned_scanner)
    db = Preprocessor(pcfg, dbconf).preprocess()
    _check_corpus_sample(db)
    assert os.listdir(pcfg.intermediate_results_directory) == []


@pytest.mark.skipif(not reference_available(), reason="no reference data")
def test_changed_input_invalidates_stages(tmp_path, monkeypatch):
    """A modified input file changes the signature: stale stages are
    ignored (fresh per-signature workdir), never mixed into the build."""
    from lapis_silo_tpu.preprocessing.preprocessor import Preprocessor

    pcfg, dbconf = _ndjson_configs(tmp_path)
    monkeypatch.setenv("SILO_KEEP_INTERMEDIATES", "1")
    Preprocessor(pcfg, dbconf).preprocess()
    inter = pcfg.intermediate_results_directory
    first = set(os.listdir(inter))
    assert len(first) == 1

    ndjson = os.path.join(pcfg.input_directory, "input_file.ndjson")
    os.utime(ndjson, (1, 1))  # same bytes, different mtime -> new identity
    db = Preprocessor(pcfg, dbconf).preprocess()
    after = set(os.listdir(inter))
    assert len(after - first) == 1, "expected a fresh per-signature workdir"
    _check_corpus_sample(db)


@pytest.mark.skipif(not reference_available(), reason="no reference data")
def test_changed_fasta_invalidates_tsv_stages(tmp_path, monkeypatch):
    """TSV+FASTA flavor: an edited FASTA must change the signature (the
    fingerprints cover the real <stem>.fasta filenames) so committed
    stages are never reused over stale genome content."""
    import shutil

    from lapis_silo_tpu.preprocessing.preprocessor import Preprocessor

    base = os.path.join(REFERENCE_ROOT, "testBaseData/exampleDataset")
    work = tmp_path / "dataset"
    shutil.copytree(base, work)
    pcfg, dbconf = _tsv_configs(tmp_path)
    pcfg.input_directory = str(work)
    monkeypatch.setenv("SILO_KEEP_INTERMEDIATES", "1")
    Preprocessor(pcfg, dbconf).preprocess()
    inter = pcfg.intermediate_results_directory
    first = set(os.listdir(inter))
    assert len(first) == 1

    os.utime(work / "gene_E.fasta", (1, 1))
    db = Preprocessor(pcfg, dbconf).preprocess()
    after = set(os.listdir(inter))
    assert len(after - first) == 1, "expected a fresh per-signature workdir"
    _check_corpus_sample(db)


def test_concurrent_resume_store_falls_back_to_tempdir(tmp_path):
    """Two live ResumeStores over the same workdir must not share spool
    files: the second holder gets a throwaway tempdir (not resumable)
    instead of interleaving appends with the first's stage commits."""
    import shutil

    from lapis_silo_tpu.preprocessing.resume import ResumeStore

    workdir = str(tmp_path / "wd")
    first = ResumeStore(workdir, "sig")
    second = ResumeStore(workdir, "sig")
    try:
        assert not first.ephemeral
        assert second.ephemeral
        assert second.workdir != first.workdir
        second.commit("scan", {"who": "second"})
        assert first.payload("scan") is None  # no cross-pollution
        assert second.payload("scan") == {"who": "second"}
    finally:
        shutil.rmtree(second.workdir, ignore_errors=True)

    # releasing the first holder frees the workdir for a new run
    first.close()
    third = ResumeStore(workdir, "sig")
    assert not third.ephemeral
    assert third.workdir == workdir
