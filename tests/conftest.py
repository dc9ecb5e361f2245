"""Test harness config: CPU backend with 8 virtual devices.

The image boots every interpreter with an 'axon' remote-TPU PJRT plugin
(sitecustomize) that overrides JAX_PLATFORMS, so the env var alone is not
enough — the platform must be forced back to cpu via jax.config before
any backend initialization. Real-TPU runs happen in bench.py only
(SURVEY.md §4: multi-chip behavior is tested on host-platform device
farms).
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
