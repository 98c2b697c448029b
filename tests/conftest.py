"""Test configuration: run the suite on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware (the driver
separately dry-runs the multichip path; bench.py runs on the real chip).

The image's sitecustomize registers the `axon` TPU-tunnel backend at
interpreter boot and force-sets ``jax_platforms="axon,cpu"``; re-point it at
CPU *before* any backend initializes — unit tests must be fast and hermetic.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
