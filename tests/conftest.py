"""Test configuration.

The harness environment pins ``JAX_PLATFORMS=axon`` (a remote TPU tunnel
with remote compilation); tests must force the CPU platform to run
hermetically.  The axon ``sitecustomize`` also initializes JAX's CPU client
with a single device at interpreter startup, so multi-device tests cannot
get a virtual mesh in-process — they spawn a scrubbed subprocess instead
(see ``tests/test_parallel.py`` and ``scrubbed_env`` below).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

# The axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter startup, and the CONFIG value beats the env var — without
# the explicit update below, "CPU" tests silently run on the tunnel TPU
# (slow, flaky RPC hangs).
import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
assert jax.default_backend() == "cpu", jax.devices()

import numpy as np
import pytest


def scrubbed_env(n_devices: int = 8):
    """Environment for subprocesses that need ``n_devices`` CPU devices:
    disables the axon sitecustomize (which pre-initializes JAX) and forces
    the virtual CPU device count."""
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    return env


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def free_port() -> str:
    """An ephemeral localhost port for jax.distributed coordinators —
    hardcoded ports collide under concurrent test runs."""
    import socket

    with socket.socket() as sk:
        sk.bind(("localhost", 0))
        return str(sk.getsockname()[1])
