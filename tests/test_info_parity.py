"""Byte-exact /info parity with the reference's pinned e2e numbers.

Every expected value below is copied from the reference's e2e suite
(endToEndTests/test/info.test.js) — they pin the exact CRoaring bitmap
sizes the reference builds for testBaseData/exampleDataset. Our /info
reproduces them through the Roaring size model (storage/roaring_stats.py)
over the compact bitplane layout.
"""

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
