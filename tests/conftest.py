"""Test configuration: run on CPU with a virtual 8-device mesh.

Multi-device correctness is tested the idiomatic JAX way — faking an 8-chip
topology on CPU with --xla_force_host_platform_device_count (SURVEY §4's
recommendation); bench.py and __graft_entry__.entry exercise the real TPU.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import pytest


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.PRNGKey(0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running regression gates")
