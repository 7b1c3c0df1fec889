"""Test config: force an 8-device virtual CPU mesh BEFORE jax import.

This is the standard TPU-less way to exercise pjit/shard_map code
(SURVEY.md §4).  The axon sitecustomize force-registers the single real
TPU, so we must clear its trigger env var too.
"""

import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
