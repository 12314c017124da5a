"""Database config validation against the reference's config fixtures
(testBaseData/test_database_config*.yaml; config_repository.test.cpp)."""

import os

import pytest

from .conftest import REFERENCE_ROOT, reference_available

BASE = os.path.join(REFERENCE_ROOT, "testBaseData")


def _path(name):
    return os.path.join(BASE, name)


@pytest.mark.skipif(not reference_available(), reason="reference data unavailable")
def test_valid_configs():
    from lapis_silo_tpu.config.database_config import get_validated_config

    from lapis_silo_tpu.config.database_config import read_database_config

    config = get_validated_config(_path("test_database_config.yaml"))
    assert config.schema.primary_key
    # the without_* fixtures are reader-level (reference database_config.test.cpp)
    without_partition = read_database_config(
        _path("test_database_config_without_partition_by.yaml"))
    assert without_partition.schema.partition_by is None
    without_date = read_database_config(
        _path("test_database_config_without_date_to_sort_by.yaml"))
    assert without_date.schema.date_to_sort_by is None
    # extra unknown entries are ignored by the reader (reference
    # database_config.test.cpp:145 — reader-level, not validated)
    from lapis_silo_tpu.config.database_config import read_database_config

    with_extra = read_database_config(
        _path("test_database_config_with_additional_entries.yaml"))
    assert with_extra.schema.metadata


@pytest.mark.skipif(not reference_available(), reason="reference data unavailable")
def test_invalid_configs():
    from lapis_silo_tpu.config.database_config import (
        ConfigError,
        get_validated_config,
    )

    with pytest.raises((ConfigError, Exception)):
        get_validated_config(_path("test_database_config_with_invalid_metadata_type.yaml"))
    with pytest.raises((ConfigError, Exception)):
        get_validated_config(_path("test_database_config_with_invalid_structure.yaml"))


def test_generate_index_rules():
    from lapis_silo_tpu.config.database_config import (
        ConfigError,
        DatabaseConfig,
        DatabaseSchema,
        Metadata,
        ValueType,
        validate_config,
    )

    def config_with(metadata, **kwargs):
        return DatabaseConfig(DatabaseSchema(
            instance_name="t", primary_key="key", metadata=metadata, **kwargs))

    # index on int forbidden
    with pytest.raises(ConfigError):
        validate_config(config_with([
            Metadata("key", ValueType.STRING),
            Metadata("age", ValueType.INT, generate_index=True)]))
    # pango without index forbidden
    with pytest.raises(ConfigError):
        validate_config(config_with([
            Metadata("key", ValueType.STRING),
            Metadata("lineage", ValueType.PANGOLINEAGE, generate_index=False)]))
    # duplicate metadata forbidden
    with pytest.raises(ConfigError):
        validate_config(config_with([
            Metadata("key", ValueType.STRING), Metadata("key", ValueType.STRING)]))
    # primary key must exist
    with pytest.raises(ConfigError):
        validate_config(config_with([Metadata("other", ValueType.STRING)]))
    # dateToSortBy must be a date
    with pytest.raises(ConfigError):
        validate_config(config_with(
            [Metadata("key", ValueType.STRING)], date_to_sort_by="key"))
    # partitionBy must be pango
    with pytest.raises(ConfigError):
        validate_config(config_with(
            [Metadata("key", ValueType.STRING)], partition_by="key"))