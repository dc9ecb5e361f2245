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
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# 8 virtual-device collectives run their participant threads 4-at-a-time
# on this 4-core host; at >=100M-record scale the first 4 shards' compute
# exceeds XLA:CPU's default 40s rendezvous termination window and the
# watchdog aborts the whole process (rendezvous.cc). These are virtual
# devices on one host — a stuck rendezvous here means slow threads, not
# a dead peer — so give the scale tests an hour.
if "collective_call_terminate" not in _flags:
    _flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
    )
os.environ["XLA_FLAGS"] = _flags
# XLA:CPU logs a full-page "AOT machine features" E-line per cache-loaded
# executable (harmless — the cache is written on this same host); silence it
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

# Test wall time is dominated by thousands of small op-by-op CPU compiles
# (the pipelines dispatch eagerly); persist ALL of them across runs — the
# package default (twopaco_tpu/__init__.py) only persists >=0.5s compiles,
# which covers the big TPU programs but none of these. Env (not
# jax.config) because twopaco_tpu/__init__.py re-applies these settings
# on its (later) import and reads the env.
os.environ["TWOPACO_COMPILE_CACHE"] = os.path.expanduser(
    "~/.cache/twopaco_tpu_xla_cpu"
)
os.environ["TWOPACO_CACHE_MIN_COMPILE_S"] = "0"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import twopaco_tpu  # noqa: F401  (applies the cache settings above)

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
