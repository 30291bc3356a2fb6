import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs the real
# multi-chip path via __graft_entry__.dryrun_multichip).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jaxcache-cpu"))
os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # disable the TPU tunnel
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize imports jax at interpreter start, so
# jax.config snapshotted JAX_PLATFORMS=axon before this file ran —
# the env mutation above is too late. Override through the config API
# (backends have not initialized yet at conftest-import time).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# env var above is read at the sitecustomize's jax import (too late here);
# the config API works after import
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The full suite compiles ~500 executables; with that many live in
    one process, a later persistent-cache load segfaults inside jax's
    executable deserialization (deterministic at test 495 before this).
    Dropping the in-memory executable cache between modules keeps the
    live-executable count bounded; compiled modules reload from the
    persistent on-disk cache cheaply."""
    yield
    jax.clear_caches()


ORACLE_LIB = os.path.join(os.path.dirname(__file__), "..", ".oracle",
                          "libref_harness.so")


def have_oracle() -> bool:
    return os.path.exists(ORACLE_LIB)


requires_oracle = pytest.mark.skipif(
    not have_oracle(),
    reason="reference harness not built (tools/build_harness.sh)",
)
