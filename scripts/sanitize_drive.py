"""ASan driver for the native layer's PYTHON call sites (no JAX import —
CPython under LD_PRELOAD=libasan is fine, the XLA runtime is not).

Run by tests/test_sanitizers.py as:
  LD_PRELOAD=$(g++ -print-file-name=libasan.so) \
  ASAN_OPTIONS=detect_leaks=0:halt_on_error=1:exitcode=66 \
  SILO_NATIVE_SUFFIX=.asan python scripts/sanitize_drive.py

Covers the sanitized variants of all three libraries exactly the way the
package calls them: the epoll server via ctypes callbacks under concurrent
keep-alive clients (+ fast-path symbol smoke), the NDJSON scanner with
dict-compressed blobs, and the ingest scatter kernels.
"""

import http.client
import json
import os
import socket
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

assert os.environ.get("SILO_NATIVE_SUFFIX") == ".asan", "run with .asan suffix"


def drive_http():
    from lapis_silo_tpu.server.native_http import NativeHTTPServer

    calls = [0]

    def router(method, target, body):
        calls[0] += 1
        return 200, {"echo": len(body), "t": target}, "v1"

    server = NativeHTTPServer(router=router, port=0, n_workers=8)
    port = server.server_address[1]
    errors = []

    def hammer(tid):
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
            for i in range(60):
                body = json.dumps({"tid": tid, "i": i, "pad": "x" * (i * 37 % 4096)})
                conn.request("POST", "/query", body=body)
                resp = conn.getresponse()
                data = resp.read()
                assert resp.status == 200 and json.loads(data)["echo"] == len(body)
            conn.close()
        except Exception as ex:  # noqa: BLE001
            errors.append(ex)

    threads = [threading.Thread(target=hammer, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    # malformed request + oversized headers paths
    s = socket.create_connection(("127.0.0.1", port), timeout=10)
    s.sendall(b"GARBAGE\r\n\r\n")
    s.recv(4096)
    s.close()
    s = socket.create_connection(("127.0.0.1", port), timeout=10)
    s.sendall(b"GET / HTTP/1.1\r\nX-F: " + b"a" * (70 * 1024))
    s.recv(4096)
    s.close()
    server.shutdown()
    assert calls[0] >= 480
    print(f"http ok ({calls[0]} routed)")


def drive_ndjson():
    from lapis_silo_tpu.common.zstd import DictDecompressor
    from lapis_silo_tpu.preprocessing.native_ndjson import NativeNdjsonScanner

    ref = b"ACGT" * 64
    scanner = NativeNdjsonScanner(
        [("main", 0, ref), ("gene", 1, b"MKV" * 40), ("main", 2, ref)],
        level=3, n_threads=2)
    lines = []
    for i in range(200):
        rec = {
            "metadata": {"key": f"s{i}", "n": i},
            "alignedNucleotideSequences": {"main": "ACGT" * (i % 7 + 1)},
            "alignedAminoAcidSequences": {"gene": "MKV*" if i % 3 else None},
            "unalignedNucleotideSequences": {"main": None if i % 5 == 0 else "NNAC" * i},
            "nucleotideInsertions": {"main": [f"{i}:ACGT"]},
            "aminoAcidInsertions": {"gene": []},
        }
        lines.append(json.dumps(rec).encode())
    records = scanner.parse(lines)
    assert len(records) == 200
    dctx = DictDecompressor(ref)
    ok = 0
    for i, rec in enumerate(records):
        if rec.status >= 0 and isinstance(rec.blobs[0], bytes):
            got = dctx.decompress(rec.blobs[0])
            assert got == ("ACGT" * (i % 7 + 1)).encode()
            ok += 1
    scanner.close()
    assert ok > 150, ok
    print(f"ndjson ok ({ok} verified)")


def drive_scatter():
    import numpy as np

    from lapis_silo_tpu import native

    rng = np.random.default_rng(0)
    batch, length, cap, words = 64, 512, 4096, 128
    ids = rng.integers(0, 16, size=(batch, length), dtype=np.uint8)
    rows = np.zeros((cap, words), dtype=np.uint32)
    row_map = rng.integers(-1, cap, size=(16, length), dtype=np.int32)
    assert native.pack_batch_compact(ids, rows, row_map, 0, n_threads=4)
    marks = native.presence(ids, 16)
    assert marks is not None and marks.shape == (16 * length,)
    out_ids = np.zeros(length, dtype=np.uint8)
    table = np.full(256, 255, dtype=np.uint8)
    for j, ch in enumerate(b"ACGT"):
        table[ch] = j
    lib = native.get_lib()
    rc = lib.silo_chars_to_ids(b"ACGT" * (length // 4), length,
                               table.ctypes.data, out_ids.ctypes.data)
    assert rc < 0 and out_ids[:4].tolist() == [0, 1, 2, 3]  # <0 = no bad char
    print("scatter ok")


if __name__ == "__main__":
    drive_http()
    drive_ndjson()
    drive_scatter()
    print("SANITIZE_DRIVE_OK")
