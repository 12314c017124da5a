"""siloApi-equivalent CLI: --preprocessing | --api.

Parity with reference src/silo_api/api.cpp:99-260 (two execution modes,
layered preprocessing config, runtime config with --dataDirectory override).

  python -m lapis_silo_tpu.cli --preprocessing \
      --preprocessingConfig cfg.yaml --databaseConfig db.yaml
  python -m lapis_silo_tpu.cli --api --dataDirectory ./output
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def setup_logging():
    logging.basicConfig(
        level=os.environ.get("SPDLOG_LEVEL", "info").upper(),
        format="[%(asctime)s] [%(levelname)s] [%(name)s] %(message)s",
    )
    os.makedirs("logs", exist_ok=True)
    perf = logging.getLogger("lapis_silo_tpu.performance")
    handler = logging.FileHandler("logs/performance.log")
    handler.setFormatter(logging.Formatter("[%(asctime)s] %(message)s"))
    perf.addHandler(handler)
    perf.propagate = False


def handle_preprocessing(args) -> int:
    from .config.database_config import get_validated_config
    from .preprocessing.preprocessing_config import read_layered
    from .preprocessing.preprocessor import Preprocessor
    from .storage.snapshot import save_database

    pcfg = read_layered(args.preprocessingConfig)
    database_config_path = args.databaseConfig or os.path.join(
        pcfg.input_directory, "database_config.yaml"
    )
    dbconf = get_validated_config(database_config_path)
    database = Preprocessor(pcfg, dbconf).preprocess()
    path = save_database(database, pcfg.output_directory)
    logging.getLogger(__name__).info("snapshot written to %s", path)
    return 0


def handle_api(args) -> int:
    from .server.http_server import DatabaseMutex, make_server
    from .server.runtime_config import RuntimeConfig
    from .server.watcher import DatabaseDirectoryWatcher

    runtime = RuntimeConfig.read(args.runtimeConfig)
    if args.dataDirectory:
        runtime.data_directory = args.dataDirectory
    if args.port:
        runtime.port = args.port

    mutex = DatabaseMutex()
    watcher = DatabaseDirectoryWatcher(runtime.data_directory, mutex)
    watcher.start()
    server = make_server(mutex, runtime.port)
    logging.getLogger(__name__).info(
        "listening on :%d, watching %s", runtime.port, runtime.data_directory
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        watcher.stop()
        server.server_close()
    return 0


def main(argv=None) -> int:
    setup_logging()
    parser = argparse.ArgumentParser(prog="lapis-silo-tpu")
    parser.add_argument("--api", action="store_true", help="run the HTTP API server")
    parser.add_argument("--preprocessing", action="store_true",
                        help="ingest input data and write a snapshot")
    parser.add_argument("--preprocessingConfig", default=None)
    parser.add_argument("--databaseConfig", default=None)
    parser.add_argument("--runtimeConfig", default=None)
    parser.add_argument("--dataDirectory", default=None)
    parser.add_argument("--port", type=int, default=None)
    args = parser.parse_args(argv)

    if args.preprocessing:
        return handle_preprocessing(args)
    if args.api:
        return handle_api(args)
    parser.error("specify --api or --preprocessing")
    return 2


if __name__ == "__main__":
    sys.exit(main())
