"""Test configuration: run on a virtual 8-device CPU mesh with f64 enabled.

The reference parametrizes its tests over cpu (+ cuda when available,
reference tests/test_cg.py:24-27); the TPU-native analog is a virtual
multi-device CPU platform (``xla_force_host_platform_device_count``) so the
data-parallel sharding paths are exercised without TPU hardware.  f64 is
enabled because several oracles need it (e.g. the M = A^{-1} one-iteration
CG test, reference tests/test_cg.py:162-224 uses torch.double).

Note: a sitecustomize hook may pre-import jax and pin a remote-TPU platform
regardless of the JAX_PLATFORMS env var, so the CPU platform and the virtual
device count are forced through jax.config / XLA_FLAGS *after* import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
