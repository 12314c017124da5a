"""Preprocessor wall-clock at scale: generate an NDJSON corpus, run the
FULL ingest pipeline (scan -> partition -> route -> segment build ->
snapshot), and report per-stage seconds.

  python scripts/ingest_bench.py [rows] [length] [--profile]

Stage times come from wrapping the preprocessor's own phase boundaries;
--profile adds a cProfile top-25 of the build. The generated NDJSON is
cached in /tmp keyed by (rows, length) — generation itself is not the
thing being measured. Reference analog: the reference's preprocessing
runtime on the same logical corpus (SURVEY §6 perf baselines).
"""

import cProfile
import io
import json
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def generate(path: str, n_rows: int, length: int) -> None:
    import numpy as np

    rng = np.random.default_rng(3)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    reference = alphabet[rng.integers(0, 4, size=length)]
    ref_str = reference.tobytes().decode()
    with open(os.path.join(os.path.dirname(path),
                           "reference_genomes.json"), "w") as f:
        json.dump({"nucleotideSequences": [
            {"name": "main", "sequence": ref_str}], "genes": []}, f)
    countries = [f"Country{i}" for i in range(40)]
    t0 = time.time()
    with open(path, "w", buffering=1 << 22) as f:
        batch = 4096
        for base in range(0, n_rows, batch):
            n = min(batch, n_rows - base)
            muts = rng.integers(0, length, size=(n, 8))
            subs = alphabet[rng.integers(0, 4, size=(n, 8))]
            seqs = np.tile(reference, (n, 1))
            rows = np.arange(n)[:, None]
            seqs[rows, muts] = subs
            dates = rng.integers(0, 1000, size=n)
            for i in range(n):
                record = {
                    "metadata": {
                        "key": f"K{base + i:08d}",
                        "date": f"202{dates[i] // 365}-0{dates[i] % 9 + 1}-1{dates[i] % 9}",
                        "country": countries[(base + i) % len(countries)],
                        "age": int(dates[i] % 90),
                    },
                    "alignedNucleotideSequences": {
                        "main": seqs[i].tobytes().decode()},
                    "alignedAminoAcidSequences": {},
                    "unalignedNucleotideSequences": {
                        "main": seqs[i, : length // 2].tobytes().decode()},
                    "nucleotideInsertions": {"main": []},
                    "aminoAcidInsertions": {},
                }
                f.write(json.dumps(record, separators=(",", ":")) + "\n")
    log(f"generated {n_rows} x {length} NDJSON in {time.time() - t0:.0f}s "
        f"({os.path.getsize(path) / 1e9:.2f} GB)")


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    length = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    profile = "--profile" in sys.argv

    work = f"/tmp/ingest_bench_{n_rows}_{length}"
    os.makedirs(work, exist_ok=True)
    path = os.path.join(work, "input_file.ndjson")
    if not os.path.exists(path):
        generate(path, n_rows, length)

    from lapis_silo_tpu.config.database_config import (
        DatabaseConfig, DatabaseSchema, Metadata, ValueType,
    )
    from lapis_silo_tpu.preprocessing.preprocessing_config import (
        PreprocessingConfig,
    )
    from lapis_silo_tpu.preprocessing.preprocessor import Preprocessor
    from lapis_silo_tpu.storage.snapshot import save_database

    config = DatabaseConfig(schema=DatabaseSchema(
        instance_name="ingest-bench",
        primary_key="key",
        metadata=[
            Metadata("key", ValueType.STRING),
            Metadata("date", ValueType.DATE),
            Metadata("country", ValueType.STRING, generate_index=True),
            Metadata("age", ValueType.INT),
        ],
        date_to_sort_by="date",
        partition_by="country",
    ))
    pcfg = PreprocessingConfig(
        input_directory=work,
        ndjson_input_filename="input_file.ndjson",
        intermediate_results_directory=os.path.join(work, "temp"),
        output_directory=os.path.join(work, "output"),
    )

    n_shards = int(os.environ.get("SILO_INGEST_SHARDS", "1"))
    t0 = time.time()
    prof = cProfile.Profile() if profile else None
    if prof:
        prof.enable()
    if n_shards > 1:
        from lapis_silo_tpu.preprocessing.sharded import sharded_preprocess

        db = sharded_preprocess(pcfg, config, n_shards)
    else:
        db = Preprocessor(pcfg, config).preprocess()
    if prof:
        prof.disable()
    build_s = time.time() - t0
    t0 = time.time()
    save_database(db, pcfg.output_directory)
    save_s = time.time() - t0
    rows = sum(p.sequence_count for p in db.partitions)
    assert rows == n_rows, (rows, n_rows)
    if prof:
        out = io.StringIO()
        pstats.Stats(prof, stream=out).sort_stats("cumulative").print_stats(25)
        log(out.getvalue())
    print(json.dumps({
        "rows": n_rows, "length": length,
        "build_s": round(build_s, 1), "snapshot_s": round(save_s, 1),
        "rows_per_s": round(n_rows / build_s, 1),
        "partitions": len(db.partitions), "shards": n_shards,
    }))


if __name__ == "__main__":
    main()
