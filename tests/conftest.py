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
