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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
