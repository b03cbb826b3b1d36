"""Test harness: run everything on CPU with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (SURVEY §4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# jax may already be imported by pytest plugins (jaxtyping) with the env
# default captured — override via the config API before any backend init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_pipe():
    from bevgen_tpu.core.config import tiny_test_config
    from bevgen_tpu.pipelines.generate import BEVGenPipeline
    import jax
    cfg = tiny_test_config()
    pipe = BEVGenPipeline.create(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    return pipe, params
