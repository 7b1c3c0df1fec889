"""Test config: force an 8-device virtual CPU mesh BEFORE any backend
initialization.

This is the standard TPU-less way to exercise pjit/shard_map code
(SURVEY.md §4).  The axon sitecustomize registers the tunneled TPU at
interpreter startup and sets ``jax_platforms="axon,cpu"`` at the
*config* level, which outranks environment variables — so the override
must also go through jax.config, and must run before anything touches
jax.devices().
"""

import os
import sys

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
