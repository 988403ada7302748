import os
import sys

# Tests run on a virtual 8-device CPU mesh so sharding/multi-chip paths are
# exercised quickly and without TPU hardware (matches the driver's dryrun
# environment). The axon boot hook (sitecustomize) force-selects the tunneled
# TPU via jax.config, so we must update the config, not just the env var.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: repeat suite runs (and repeated shapes within a
# run) skip XLA:CPU's multi-second compiles of the interpret-mode kernels.
os.makedirs("/tmp/jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
