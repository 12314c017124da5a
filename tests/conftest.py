import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs the
# multi-chip path). NOTE: this container's sitecustomize registers an `axon`
# TPU backend and force-selects it via jax.config (overriding JAX_PLATFORMS
# env), so we must override back through jax.config before first backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
assert jax.devices()[0].platform == "cpu", jax.devices()

import pytest  # noqa: E402

# CI checks out the (public) reference repo elsewhere and points this at it
REFERENCE_ROOT = os.environ.get("SILO_REFERENCE_ROOT", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "testBaseData"))


@pytest.fixture(scope="session")
def example_dataset_db():
    """The exampleDataset corpus built through the full ingest pipeline."""
    if not reference_available():
        pytest.skip("reference test data not available")
    from lapis_silo_tpu.config.database_config import get_validated_config
    from lapis_silo_tpu.preprocessing.preprocessing_config import read_preprocessing_config
    from lapis_silo_tpu.preprocessing.preprocessor import Preprocessor

    base = os.path.join(REFERENCE_ROOT, "testBaseData/exampleDataset/")
    dbconf = get_validated_config(base + "database_config.yaml")
    pcfg = read_preprocessing_config(base + "preprocessing_config.yaml")
    pcfg.input_directory = base
    return Preprocessor(pcfg, dbconf).preprocess()
