"""Byte-exact /info parity with the reference's pinned e2e numbers.

Every expected value below is copied from the reference's e2e suite
(endToEndTests/test/info.test.js) — they pin the exact CRoaring bitmap
sizes the reference builds for testBaseData/exampleDataset. Our /info
reproduces them through the Roaring size model (storage/roaring_stats.py)
over the compact bitplane layout.
"""

import json
import os

import numpy as np
import pytest

from lapis_silo_tpu.storage import roaring_stats


def test_info_exact(example_dataset_db):
    assert example_dataset_db.info() == {
        "nBitmapsSize": 3898,
        "sequenceCount": 100,
        "totalSize": 26335659,
    }


def test_detailed_info_exact(example_dataset_db):
    detailed = example_dataset_db.detailed_info()
    assert detailed["bitmapSizePerSymbol"] == {
        "-": 2648220, "A": 2635348, "B": 2631464, "C": 2634362,
        "D": 2631464, "G": 2633570, "H": 2631464, "K": 2631594,
        "M": 2631554, "N": 2631464, "R": 2631514, "S": 2631464,
        "T": 2638765, "V": 2631464, "W": 2631514, "Y": 2631494,
    }
    section = detailed["bitmapContainerSizePerGenomeSection"]
    assert section["bitmapContainerSizeStatistic"] == {
        "numberOfArrayContainers": 3065,
        "numberOfBitsetContainers": 0,
        "numberOfRunContainers": 3,
        "numberOfValuesStoredInArrayContainers": 4377,
        "numberOfValuesStoredInBitsetContainers": 0,
        "numberOfValuesStoredInRunContainers": 9,
        "totalBitmapSizeArrayContainers": 8754,
        "totalBitmapSizeBitsetContainers": 0,
        "totalBitmapSizeRunContainers": 18,
    }
    assert section["sectionLength"] == 500
    per_sym = section["sizePerGenomeSymbolAndSection"]
    assert set(per_sym) == {"-", "N", "NOT_N_NOT_GAP"}
    # 29903-position main genome -> 60 sections; no bitset containers at
    # 100 sequences, so every section array is zero
    assert all(len(v) == 60 for v in per_sym.values())
    assert all(all(x == 0 for x in v) for v in per_sym.values())
    assert section["totalBitmapSizeFrozen"] > 0
    assert section["totalBitmapSizeComputed"] > 0


def test_detailed_info_without_main_raises(example_dataset_db):
    from lapis_silo_tpu.storage.database import Database

    db = Database.empty()
    # reference: DetailedDatabaseInfo serialization does sequences.at("main")
    # -> std::out_of_range -> HTTP 500
    with pytest.raises(KeyError):
        db.detailed_info()


def test_tpu_info_surface(example_dataset_db):
    info = example_dataset_db.tpu_info()
    assert info["sequenceCount"] == 100
    assert info["partitions"] == 11
    assert info["segments"]["main"]["length"] == 29903
    assert 0 < info["segments"]["main"]["compactSizeBytes"] <= (
        info["segments"]["main"]["denseSizeBytes"])


# -- model unit tests (sizes validated against CRoaring semantics) ----------

def _single(values):
    values = np.asarray(sorted(values), dtype=np.int64)
    ids = np.zeros(len(values), dtype=np.int64)
    return roaring_stats.batch_stats(ids, values, 1)


def test_empty_bitmap_sizes():
    st = _single([])
    assert st.portable[0] == 8  # cookie + zero container count
    assert st.nonportable[0] == 5  # 1 + min(8, 4 + 4*0)
    assert st.frozen[0] == 4


def test_small_array_bitmap():
    st = _single([1, 5, 9])
    # 3 isolated values: array container (run would be 2+4*3=14 > 2*3=6)
    assert st.n_array[0] == 1 and st.n_run[0] == 0
    # portable: 4+4+4+4 header + 6 data = 22; as-array: 4+12=16 -> 17
    assert st.portable[0] == 22
    assert st.nonportable[0] == 17


def test_run_conversion_boundary():
    # 2-value single run: run size 6 vs array 4 -> stays array
    st = _single([10, 11])
    assert st.n_array[0] == 1 and st.n_run[0] == 0
    # 3-value single run: run size 6 vs array 6 -> converts (<=)
    st = _single([10, 11, 12])
    assert st.n_run[0] == 1 and st.n_array[0] == 0
    assert st.b_run[0] == 6 and st.v_run[0] == 3


def test_full_range_bitmap():
    # a null genome's missing bitmap: addRange(0, 29903) -> one run container
    st = _single(range(29903))
    assert st.n_run[0] == 1
    # portable: 4 cookie + 1 run-flag byte + 4 desc + (2+4) data = 15
    assert st.portable[0] == 15
    assert st.nonportable[0] == 16


def test_bitset_container():
    # 5000 isolated even values in one container: array would be 10000 B,
    # run 2+4*5000; card > 4096 -> bitset wins
    st = _single(range(0, 10000, 2))
    assert st.n_bitset[0] == 1
    assert st.b_bitset[0] == 8192
    assert st.v_bitset[0] == 5000
    # portable: 4+4+4+4 + 8192
    assert st.portable[0] == 8208


def test_multi_container_offsets():
    # 5 containers (>= NO_OFFSET_THRESHOLD) each a full-run block:
    # has-run header includes the offset table
    values = []
    for hi in range(5):
        values.extend(range(hi << 16, (hi << 16) + 5))
    st = _single(values)
    assert st.n_run[0] == 5
    # header: 4 + ceil(5/8)=1 + 4*5 + 4*5 = 45; data: 5*(2+4) = 30
    assert st.portable[0] == 75


def test_csr_and_dense_models_agree(example_dataset_db):
    # content-determined: the model must not depend on the physical layout
    part = example_dataset_db.partitions[0]
    seg = part.nuc_sequences["main"]
    st = roaring_stats.segment_stats(seg)
    assert st.total_nonportable > 0
    assert int(st.per_symbol_portable.sum()) == st.portable_total


def test_batch_stats_words_matches_value_model():
    """The word-level container model (O(nnz words)) must agree with the
    per-value model on randomized bitmaps — especially run merges across
    word boundaries (prev bit 31 / cur bit 0) and container boundaries."""
    import numpy as np

    from lapis_silo_tpu.storage.roaring_stats import batch_stats, batch_stats_words

    rng = np.random.default_rng(17)
    for trial in range(20):
        n_bitmaps = int(rng.integers(1, 6))
        pairs_b, pairs_v = [], []
        wl_b, wl_w, wl_words = [], [], []
        for b in range(n_bitmaps):
            style = trial % 4
            if style == 0:      # sparse random values
                vals = np.unique(rng.integers(0, 1 << 18, size=rng.integers(0, 400)))
            elif style == 1:    # dense runs crossing word/container edges
                starts = rng.integers(0, 1 << 17, size=rng.integers(1, 6))
                vals = np.unique(np.concatenate(
                    [np.arange(s, s + rng.integers(1, 5000)) for s in starts]))
            elif style == 2:    # empty bitmap
                vals = np.zeros(0, dtype=np.int64)
            else:               # bitset-dense container
                vals = np.unique(rng.integers(0, 9000, size=7000))
            pairs_b.append(np.full(len(vals), b, dtype=np.int64))
            pairs_v.append(vals.astype(np.int64))
            # pack the same values into words
            if len(vals):
                widx = vals // 32
                words = np.zeros(int(widx.max()) + 1, dtype=np.uint32)
                np.bitwise_or.at(words, widx,
                                 np.uint32(1) << (vals % 32).astype(np.uint32))
                nz = np.flatnonzero(words)
                wl_b.append(np.full(len(nz), b, dtype=np.int64))
                wl_w.append(nz.astype(np.int64))
                wl_words.append(words[nz])
        pb = np.concatenate(pairs_b); pv = np.concatenate(pairs_v)
        order = np.lexsort((pv, pb))
        want = batch_stats(pb[order], pv[order], n_bitmaps)
        if wl_b:
            wb = np.concatenate(wl_b); ww = np.concatenate(wl_w)
            wv = np.concatenate(wl_words)
            order = np.lexsort((ww, wb))
            got = batch_stats_words(wb[order], ww[order], wv[order], n_bitmaps)
        else:
            got = batch_stats_words(np.zeros(0, np.int64), np.zeros(0, np.int64),
                                    np.zeros(0, np.uint32), n_bitmaps)
        for fld in ("portable", "nonportable", "frozen", "n_array", "n_run",
                    "n_bitset", "v_array", "v_run", "v_bitset", "b_array",
                    "b_run", "b_bitset"):
            np.testing.assert_array_equal(getattr(got, fld), getattr(want, fld),
                                          err_msg=f"trial {trial} field {fld}")


def test_snapshot_precomputes_info_stats(example_dataset_db, tmp_path,
                                          monkeypatch):
    """save_database stores the /info size model in the snapshot; a loaded
    database answers /info and /info?details=true byte-identically WITHOUT
    recomputing it (the 10M first-/info cost moves to offline ingest)."""
    from lapis_silo_tpu.storage.snapshot import load_database, save_database

    expected_info = example_dataset_db.info()
    expected_details = example_dataset_db.detailed_info()
    path = save_database(example_dataset_db, str(tmp_path))
    assert os.path.exists(os.path.join(path, "roaring_stats.npz"))

    loaded = load_database(path)
    assert loaded._roaring_stats is not None  # installed from the sidecar

    def boom(seg):
        raise AssertionError("size model must not be recomputed after load")

    monkeypatch.setattr(roaring_stats, "segment_stats", boom)
    assert loaded.info() == expected_info
    assert loaded.detailed_info() == expected_details


def test_snapshot_stats_sidecar_optional(example_dataset_db, tmp_path,
                                         monkeypatch):
    """Snapshots without the sidecar (older format, SILO_SNAPSHOT_STATS=0)
    and snapshots with a CORRUPT sidecar still load and compute /info
    lazily, byte-identically."""
    from lapis_silo_tpu.storage.snapshot import load_database, save_database

    expected_info = example_dataset_db.info()

    monkeypatch.setenv("SILO_SNAPSHOT_STATS", "0")
    path = save_database(example_dataset_db, str(tmp_path / "nostats"))
    assert not os.path.exists(os.path.join(path, "roaring_stats.npz"))
    loaded = load_database(path)
    assert loaded._roaring_stats is None
    assert loaded.info() == expected_info

    monkeypatch.delenv("SILO_SNAPSHOT_STATS")
    path2 = save_database(example_dataset_db, str(tmp_path / "corrupt"))
    with open(os.path.join(path2, "roaring_stats.npz"), "wb") as f:
        f.write(b"not an npz")
    loaded2 = load_database(path2)
    assert loaded2._roaring_stats is None  # fell back to lazy
    assert loaded2.info() == expected_info


@pytest.fixture(scope="module")
def gap_corpus_factory(tmp_path_factory):
    """Corpora big enough to make REAL CRoaring bitset containers (>4096
    values in one 65536-chunk): n_gap_rows sequences carry '-' at position
    6 (every 3rd row — single-value runs, so a run container would cost
    2+4*n_runs > 8192 bytes and the bitmap stays a bitset)."""

    def build(n_rows: int, gap_stride: int):
        from lapis_silo_tpu.config.database_config import get_validated_config
        from lapis_silo_tpu.preprocessing.preprocessing_config import (
            PreprocessingConfig,
        )
        from lapis_silo_tpu.preprocessing.preprocessor import Preprocessor

        work = tmp_path_factory.mktemp("gap_corpus")
        reference = "ACGTACGTACGTACGTACGTACGTACGTAC"
        (work / "reference_genomes.json").write_text(json.dumps({
            "nucleotideSequences": [{"name": "main", "sequence": reference}],
            "genes": [],
        }))
        (work / "database_config.yaml").write_text(
            "schema:\n  instanceName: gaptest\n  metadata:\n"
            "    - name: key\n      type: string\n  primaryKey: key\n")
        with open(work / "metadata.tsv", "w") as f:
            f.write("key\n")
            for i in range(n_rows):
                f.write(f"K{i:06d}\n")
        with open(work / "nuc_main.fasta", "w") as f:
            for i in range(n_rows):
                seq = reference
                if i % gap_stride == 0:
                    seq = seq[:5] + "-" + seq[6:]
                f.write(f">K{i:06d}\n{seq}\n")
        pcfg = PreprocessingConfig(
            input_directory=str(work),
            metadata_filename="metadata.tsv",
        )
        dbconf = get_validated_config(str(work / "database_config.yaml"))
        return Preprocessor(pcfg, dbconf).preprocess()

    return build


def test_gap_bitset_container_500(gap_corpus_factory):
    """PIN the GAP-500 branch on a corpus that actually produces a bitset
    container for the gap symbol: 5,334 of 16,000 rows share '-' at one
    position (>4096 values, single-value runs). The reference increments
    size_per_genome_symbol_and_section.at("GAP") (database.cpp:291) on a
    map whose constructor (database.cpp:153-158) only created keys
    {"-", "N", "NOT_N_NOT_GAP"} — std::out_of_range, what() == "map::at",
    surfaced by the error handler as HTTP 500 {"error": "Internal server
    error", "message": "map::at"} (error_request_handler.cpp:28)."""
    db = gap_corpus_factory(16000, 3)
    # precondition: the gap bitmap at position 6 really is a bitset
    # container in the Roaring size model
    stats = [per["main"] for per in db._nuc_roaring_stats() if "main" in per]
    assert any(st.bitset_gap.any() for st in stats), \
        "corpus failed to produce a GAP bitset container"
    with pytest.raises(KeyError) as excinfo:
        db.detailed_info()
    assert str(excinfo.value) == "map::at"

    # over the router: the handler chain turns it into the reference's 500
    from lapis_silo_tpu.server.router import route_request

    class _View:
        data_version = db.data_version

        def info(self, detailed=False, tpu=False):
            return db.detailed_info() if detailed else db.info()

    class _Backend:
        def resolve(self):
            return _View()

    status, body, _version = route_request(
        _Backend(), "GET", "/info?details=true", b"")
    assert status == 500
    assert body == {"error": "Internal server error", "message": "map::at"}


def test_gap_array_container_ok(gap_corpus_factory):
    """Control: the same corpus shape with <=4096 gap values (array
    container) serves /info?details=true fine, with the '-' section row
    all zero (the reference records gap bitsets under the nonexistent
    "GAP" key, never under '-')."""
    db = gap_corpus_factory(12000, 3)  # 4000 gaps <= 4096 -> array
    detailed = db.detailed_info()
    sections = detailed["bitmapContainerSizePerGenomeSection"]
    assert all(v == 0
               for v in sections["sizePerGenomeSymbolAndSection"]["-"])
