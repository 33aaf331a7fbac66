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


def env_factory(**defaults):
    """Memoized QuadrupedEnv factory for test modules.

    QuadrupedEnv's jitted methods key on the INSTANCE (static self), so
    two envs built from identical configs re-trace the whole scalarized
    dynamics graph twice — and tracing/lowering, not XLA backend compile,
    dominates this suite's wall time (measured: cold-persistent-cache
    17:52 vs warm 16:45 for the fast tier — the persistent cache only
    skips backend compile). Returning the SAME instance for identical
    kwargs converts those re-traces into in-memory jit-cache hits.
    Sharing is safe: the env is functional (reset/step are pure)."""
    from functools import lru_cache

    from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv

    @lru_cache(maxsize=None)
    def _cached(items):
        kw = dict(defaults)
        kw.update(dict(items))
        return QuadrupedEnv(EnvConfig(**kw))

    def make(**kw):
        return _cached(tuple(sorted(kw.items())))

    return make


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
