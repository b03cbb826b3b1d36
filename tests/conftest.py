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

# Persistent XLA compilation cache: this single-core host pays 10-70 s
# per multi-device compile; repeat runs (local iteration, CI re-runs)
# hit the disk cache instead. Keyed by HLO hash — safe across edits.
_cache_dir = os.environ.get(
    "BEVGEN_TEST_COMPILE_CACHE",
    os.path.join(os.path.dirname(__file__), ".jax_compile_cache"))
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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
