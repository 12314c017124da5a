"""End-to-end HTTP serving benchmark: spins the real API server on a
synthetic corpus and hammers /query with concurrent count queries — the
full path (HTTP -> JSON parse -> micro-batched device dispatch).

Env knobs: SILO_BENCH_ROWS (65536), SILO_BENCH_LENGTH (29903),
SILO_BENCH_CLIENTS (32), SILO_BENCH_SECONDS (10), SILO_BENCH_PORT (8099).
"""

import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    n_rows = int(os.environ.get("SILO_BENCH_ROWS", 65536))
    length = int(os.environ.get("SILO_BENCH_LENGTH", 29903))
    n_clients = int(os.environ.get("SILO_BENCH_CLIENTS", 32))
    seconds = float(os.environ.get("SILO_BENCH_SECONDS", 10))
    port = int(os.environ.get("SILO_BENCH_PORT", 8099))

    from lapis_silo_tpu.ops.device_engine import DeviceEngine
    from lapis_silo_tpu.query.engine import Query
    from lapis_silo_tpu.server.http_server import DatabaseMutex, make_server
    from lapis_silo_tpu.testing import sample_count_queries, synthetic_database

    t0 = time.time()
    db = synthetic_database(n_rows=n_rows, length=length, n_partitions=1)
    log(f"corpus {time.time() - t0:.0f}s")
    queries = sample_count_queries(db, n_queries=64)

    mutex = DatabaseMutex(db)
    server = make_server(mutex, port=port)
    server_thread = threading.Thread(target=server.serve_forever, daemon=True)
    server_thread.start()
    url = f"http://127.0.0.1:{port}/query"

    def post(body: str) -> dict:
        req = urllib.request.Request(
            url, data=body.encode(), headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=600) as resp:
            return json.loads(resp.read())

    # warm-up: compile the VM executable before measuring
    t0 = time.time()
    warm = post(queries[0])
    log(f"warm-up {time.time() - t0:.1f}s -> {warm}")

    # verify a few counts against the engine directly
    engine = db.device_engine if getattr(db, "device_engine", None) else DeviceEngine(db)
    for q in queries[:4]:
        expected = engine.count(Query(q).filter)
        got = post(q)["queryResult"][0]["count"]
        assert got == expected, (q, got, expected)

    stop_at = time.time() + seconds
    latencies: list[float] = []
    lock = threading.Lock()

    def client(seed: int):
        i = seed
        local = []
        while time.time() < stop_at:
            body = queries[i % len(queries)]
            t0 = time.perf_counter()
            post(body)
            local.append(time.perf_counter() - t0)
            i += 1
        with lock:
            latencies.extend(local)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    t_start = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.time() - t_start
    server.shutdown()

    latencies.sort()
    qps = len(latencies) / elapsed
    p50 = latencies[len(latencies) // 2] if latencies else float("nan")
    p99 = latencies[int(len(latencies) * 0.99)] if latencies else float("nan")
    log(f"requests={len(latencies)} clients={n_clients} elapsed={elapsed:.1f}s")
    print(json.dumps({
        "metric": "http_count_queries_per_sec",
        "value": round(qps, 2),
        "unit": f"req/s ({n_rows} seqs, {n_clients} clients, 1 chip)",
        "p50_ms": round(p50 * 1e3, 2),
        "p99_ms": round(p99 * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
