"""End-to-end HTTP serving benchmark: spins the real API server on a
synthetic corpus and hammers /query with concurrent count queries — the
full path (HTTP -> native body match -> batched device dispatch for
registered counts; HTTP -> JSON parse -> micro-batcher for the rest).

Load generation is native (native/loadgen, epoll + keep-alive): Python
client threads cap out near 3k req/s on this 2-vCPU box and would measure
the client, not the server. Set SILO_BENCH_PYCLIENT=1 to force the Python
fallback clients.

Env knobs: SILO_BENCH_ROWS (65536), SILO_BENCH_LENGTH (29903),
SILO_BENCH_CLIENTS (384 native / 32 python), SILO_BENCH_SECONDS (10),
SILO_BENCH_PORT (18099), SILO_FASTPATH (1).
"""

import json
import os
import subprocess
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOADGEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "native", "loadgen")


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    if os.environ.get("SILO_BENCH_CPU", "0") == "1":
        # smoke-test mode: the sitecustomize force-selects the axon TPU
        # backend via jax.config, so env vars alone cannot override it
        import jax

        jax.config.update("jax_platforms", "cpu")
    use_native_client = (os.path.exists(LOADGEN)
                         and os.environ.get("SILO_BENCH_PYCLIENT", "0") != "1")
    n_rows = int(os.environ.get("SILO_BENCH_ROWS", 65536))
    length = int(os.environ.get("SILO_BENCH_LENGTH", 29903))
    # native default 1024: the drainer pipelines two 512-task batches, so
    # the closed-loop client pool must cover both for the overlap to exist
    n_clients = int(os.environ.get(
        "SILO_BENCH_CLIENTS", "1024" if use_native_client else "32"))
    seconds = float(os.environ.get("SILO_BENCH_SECONDS", 10))
    # ports 80xx-81xx belong to the TPU relay on this box — stay high
    port = int(os.environ.get("SILO_BENCH_PORT", 18099))

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

    # Prime every body once so count fast-path registration (async wrt the
    # first answer) has settled before measurement; re-verify via HTTP that
    # the registered path returns the same counts the engine computed.
    expected_counts = {}
    for q in queries:
        expected_counts[q] = post(q)["queryResult"][0]["count"]
    time.sleep(0.5)
    for q in queries[:8]:
        got = post(q)["queryResult"][0]["count"]
        assert got == expected_counts[q], (q, got, expected_counts[q])

    if use_native_client:
        with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
            f.write("\n".join(queries) + "\n")
            bodies_path = f.name
        try:
            out = subprocess.run(
                [LOADGEN, "127.0.0.1", str(port), "/query", bodies_path,
                 str(n_clients), str(seconds)],
                capture_output=True, text=True, check=True, timeout=seconds + 60,
            ).stdout.strip()
        finally:
            os.unlink(bodies_path)
        server.shutdown()
        stats = json.loads(out)
        assert stats["errors"] == 0, stats
        log(f"requests={stats['requests']} conns={n_clients} "
            f"elapsed={stats['elapsed_s']:.1f}s")
        print(json.dumps({
            "metric": "http_count_queries_per_sec",
            "value": round(stats["req_per_s"], 2),
            "unit": f"req/s ({n_rows} seqs, {n_clients} conns, 1 chip)",
            "p50_ms": stats["p50_ms"],
            "p99_ms": stats["p99_ms"],
        }))
        return

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
