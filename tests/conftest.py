import os
import sys

# Run the test suite on a virtual 8-device CPU mesh so multi-chip sharding
# paths are exercised without TPU hardware (the session env may point
# JAX_PLATFORMS at the tunneled TPU; tests must not depend on it).
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    xla_flags = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
if "xla_cpu_parallel_codegen_split_count" not in xla_flags:
    # XLA's CPU backend JITs each program via parallel LLVM codegen
    # (default 32 splits); on this 1-core box full-suite runs have
    # flakily segfaulted inside backend_compile_and_load (CLAUDE.md).
    # Single-split codegen removes the compile-time thread fan-out.
    xla_flags = (
        xla_flags + " --xla_cpu_parallel_codegen_split_count=1"
    ).strip()
os.environ["XLA_FLAGS"] = xla_flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU through
# the config so the suite runs on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the CPU suite: repeat runs skip XLA CPU
# recompiles entirely, which both cuts suite wall time and removes most
# exposure to the flaky late-suite segfault inside XLA's CPU
# backend_compile_and_load (CLAUDE.md "Performance rules"; the crash is
# in the compile step, so cache hits bypass it). Kept separate from the
# TPU tunnel cache (.jax_cache) so the two key populations never mix.
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache_cpu",
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
# ... and export the same settings as env vars: service-bridge worker
# processes are started with the `spawn` method and inherit os.environ,
# not the parent's jax.config — without this, every worker recompiles
# its programs on every run, and those compiles run CONCURRENTLY with
# the parent's (the known 1-core segfault mode). With the env vars set,
# warm workers hit the shared persistent cache and never compile.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")

# allow float64 parity checks against scipy/numpy oracles
jax.config.update("jax_enable_x64", True)
