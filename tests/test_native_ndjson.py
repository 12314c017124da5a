"""Native NDJSON scanner (native/silo_ndjson.cpp) unit tests.

The scanner must either produce EXACTLY what the pure-Python path produces
(spans + dict-compressed blobs) or flag the record for Python fallback —
never a silently different result.
"""

import json

import pytest

from lapis_silo_tpu.common.zstd import DictCompressor, DictDecompressor
from lapis_silo_tpu.preprocessing.native_ndjson import (
    BLOB_ABSENT,
    BLOB_NULL,
    NativeNdjsonScanner,
)

REF_A = b"ACGTACGTAC"
REF_B = b"MKLVF"


@pytest.fixture(scope="module")
def scanner():
    try:
        return NativeNdjsonScanner(
            [("main", 0, REF_A), ("E", 1, REF_B), ("main", 2, REF_A)])
    except OSError:
        pytest.skip("libsilo_ndjson.so unavailable")


def test_blob_parity_with_python_compressor(scanner):
    line = json.dumps({
        "metadata": {"key": "s1", "n": 3},
        "alignedNucleotideSequences": {"main": "ACGTACGTAT"},
        "alignedAminoAcidSequences": {"E": "MKLVX"},
        "unalignedNucleotideSequences": {"main": "ACGT"},
    }).encode()
    [rec] = scanner.parse([line])
    assert rec.status == 0
    assert rec.blobs[0] == DictCompressor(REF_A).compress(b"ACGTACGTAT")
    assert rec.blobs[1] == DictCompressor(REF_B).compress(b"MKLVX")
    assert DictDecompressor(REF_A).decompress(rec.blobs[2]) == b"ACGT"
    off, length = rec.meta_span
    assert json.loads(line[off:off + length]) == {"key": "s1", "n": 3}


def test_null_and_absent_sequences(scanner):
    line = json.dumps({
        "metadata": {},
        "alignedNucleotideSequences": {"main": None},
    }).encode()
    [rec] = scanner.parse([line])
    assert rec.status == 0
    assert rec.blobs == [BLOB_NULL, BLOB_ABSENT, BLOB_ABSENT]


def test_unknown_segment_names_are_ignored(scanner):
    line = json.dumps({
        "alignedNucleotideSequences": {"other": "ACGT", "main": "ACGTACGTAC"},
    }).encode()
    [rec] = scanner.parse([line])
    assert rec.status == 0
    assert DictDecompressor(REF_A).decompress(rec.blobs[0]) == b"ACGTACGTAC"
    assert rec.meta_span is None


def test_insertion_spans(scanner):
    line = json.dumps({
        "nucleotideInsertions": {"main": ["10:AC"]},
        "aminoAcidInsertions": {"E": []},
    }).encode()
    [rec] = scanner.parse([line])
    assert rec.status == 0
    off, length = rec.nuc_ins_span
    assert json.loads(line[off:off + length]) == {"main": ["10:AC"]}
    off, length = rec.aa_ins_span
    assert json.loads(line[off:off + length]) == {"E": []}


@pytest.mark.parametrize("line", [
    b'not json at all',
    b'{"alignedNucleotideSequences":{"main":"AC\\u0047T"}}',   # escape in seq
    b'{"alignedNucleotideSequences":{"main":123}}',            # non-string seq
    b'{"alignedNucleotideSequences":null}',                    # null section
    b'{"metadata":{},"metadata":{}}',                          # duplicate key
    b'{"alignedNucleotideSequences":{"main":"ACGT","main":"ACGT"}}',
    b'{"metadata":{}} trailing',
])
def test_fallback_records(scanner, line):
    [rec] = scanner.parse([line])
    assert rec.status < 0
    assert rec.blobs == [BLOB_ABSENT, BLOB_ABSENT, BLOB_ABSENT]


def test_fallback_keeps_blob_stream_aligned(scanner):
    """A failed record must contribute zero blob bytes — records after it
    still decode correctly."""
    ok = json.dumps({
        "alignedNucleotideSequences": {"main": "ACGTACGTAT"},
    }).encode()
    bad = b'{"alignedNucleotideSequences":{"main":"AC\\u0047T"}}'
    recs = scanner.parse([ok, bad, ok])
    assert [r.status for r in recs] == [0, -1, 0]
    for rec in (recs[0], recs[2]):
        assert DictDecompressor(REF_A).decompress(rec.blobs[0]) == b"ACGTACGTAT"


def test_escaped_metadata_is_fine(scanner):
    """Escapes in NON-sequence values don't force a fallback: the metadata
    span goes through json.loads anyway."""
    line = b'{"metadata":{"k":"a\\"b"},"alignedNucleotideSequences":{"main":"ACGT"}}'
    [rec] = scanner.parse([line])
    assert rec.status == 0
    off, length = rec.meta_span
    assert json.loads(line[off:off + length]) == {"k": 'a"b'}


def test_batch_order_multithreaded(scanner):
    """Blobs come back in record order even with worker threads."""
    lines = []
    seqs = []
    for i in range(64):
        seq = "ACGTACGTAC"[:5] + "ACGTT"[i % 2] * 5
        seqs.append(seq)
        lines.append(json.dumps(
            {"alignedNucleotideSequences": {"main": seq}}).encode())
    recs = scanner.parse(lines)
    d = DictDecompressor(REF_A)
    for seq, rec in zip(seqs, recs):
        assert rec.status == 0
        assert d.decompress(rec.blobs[0]).decode() == seq
