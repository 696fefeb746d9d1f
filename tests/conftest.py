"""Test configuration: force an 8-device virtual CPU platform.

The reference tests distributed behaviour by monkeypatching runtime globals
(reference tests/test_training_utils.py:400-533). We go one better: JAX can
expose N real host-platform devices, so sharding/collective tests execute the
actual multi-device code path without hardware.

This must run before jax is imported anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: scan/remat/cond graphs compile slowly on the
# CPU backend; cache across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# Some TPU environments register a platform plugin that programmatically
# overrides JAX_PLATFORMS; force the CPU platform explicitly so tests never
# contend for (or depend on) a real chip.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Tests (and their subprocesses) deliberately train tiny models from random
# initialization; production runs hard-error without pretrained weights
# (models/checkpoint.py load_model).
os.environ.setdefault("WFT_ALLOW_RANDOM_INIT", "1")
