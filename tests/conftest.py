"""Test config: run on a virtual 8-device CPU mesh so sharding paths are
exercised without a TPU slice (driver benches on real TPU separately).

NOTE: this container's sitecustomize force-selects the 'axon' TPU platform
via jax.config, overriding the JAX_PLATFORMS env var — so we must override
back to CPU *after* import, before any backend is touched.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compile cache: the scalarized dynamics graph is large, so cold
# compiles are minutes; cached reruns are seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import sys  # noqa: E402

# The axon TPU-tunnel plugin rides in via PYTHONPATH (/root/.axon_site)
# and opens its remote TCP connection at plugin discovery EVEN when the
# selected platform is cpu — observed blocking in tcp_recvmsg for minutes
# when the tunnel is unhealthy. The suite is CPU-only; drop the plugin's
# path before jax can discover it.
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    A monolithic full-suite run accumulates hundreds of live XLA:CPU
    executables (jitted methods keyed on static env/problem instances are
    never collected); past ~110 tests the NEXT fresh compilation
    segfaults inside the XLA CPU compiler — reproduced deterministically
    at the first fresh compile of whatever module runs last, and absent
    in any half-suite run. Clearing per module keeps the live set small;
    the persistent compilation cache makes the forced re-traces cheap.
    """
    yield
    jax.clear_caches()
