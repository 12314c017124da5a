"""Watcher fault tolerance (reference database_directory_watcher.cpp:115-156):
bad snapshots are skipped/logged, the server keeps serving the old data, and
a newer valid snapshot hot-swaps in."""

import json
import shutil


def test_watcher_skips_invalid_and_hot_swaps(example_dataset_db, tmp_path):
    from lapis_silo_tpu.server.http_server import DatabaseMutex
    from lapis_silo_tpu.server.watcher import DatabaseDirectoryWatcher
    from lapis_silo_tpu.storage.snapshot import DATA_VERSION_FILE, save_database

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    mutex = DatabaseMutex()
    watcher = DatabaseDirectoryWatcher(str(data_dir), mutex, poll_seconds=3600)

    # empty dir: still serving the empty database
    watcher.check_once()
    assert mutex.get_database().info()["sequenceCount"] == 0

    # garbage "snapshot": name not digits / missing data_version / mismatched
    (data_dir / "not_a_version").mkdir()
    bogus = data_dir / "1111111111"
    bogus.mkdir()
    (bogus / DATA_VERSION_FILE).write_text("2222222222")  # mismatch -> invalid
    watcher.check_once()
    assert mutex.get_database().info()["sequenceCount"] == 0

    # valid snapshot appears -> hot swap
    example_dataset_db.data_version.value = "1700000000"
    path = save_database(example_dataset_db, str(data_dir))
    assert path.endswith("1700000000")
    watcher.check_once()
    db = mutex.get_database()
    assert db.info()["sequenceCount"] == 100
    result = db.execute_query(json.dumps(
        {"action": {"type": "Aggregated"}, "filterExpression": {"type": "True"}}))
    assert result["queryResult"] == [{"count": 100}]

    # corrupt NEWER snapshot: load fails, old stays live
    newer = data_dir / "1800000000"
    newer.mkdir()
    (newer / DATA_VERSION_FILE).write_text("1800000000")
    (newer / "manifest.json").write_text("{ corrupt")
    watcher.check_once()
    assert mutex.get_database().info()["sequenceCount"] == 100

    # an even newer VALID snapshot swaps in
    example_dataset_db.data_version.value = "1900000000"
    save_database(example_dataset_db, str(data_dir))
    watcher.check_once()
    assert mutex.get_database().data_version.value == "1900000000"
    shutil.rmtree(data_dir)
