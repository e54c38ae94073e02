"""Test config: force JAX onto a virtual 8-device CPU platform.

The container's sitecustomize registers an 'axon' TPU-tunnel backend and
forcibly sets jax_platforms='axon,cpu' (overriding JAX_PLATFORMS), which
routes every op through a remote relay — catastrophic for unit tests.
We override back to pure CPU *before* any backend is initialized, and use
8 virtual host devices so sharding logic is exercised without hardware.
bench.py / production runs keep the default (real TPU) platform.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def _seeded_rng(key: str):
    import zlib

    import numpy as np
    return np.random.default_rng(zlib.crc32(key.encode()))


@pytest.fixture()
def rng(request):
    """Per-test RNG seeded from the test's node id: every test sees the
    same stream whether it runs alone, in its file, or in the full suite
    (a session-scoped shared stream made outcomes order-dependent —
    VERDICT r3 weak #4)."""
    return _seeded_rng(request.node.nodeid)


@pytest.fixture(scope="module")
def module_rng(request):
    """Module-scoped variant for shared fixtures (synthetic corpora built
    once per file) — seeded from the module path, so the corpus is the
    same whether the file runs alone or in the suite."""
    return _seeded_rng(request.module.__name__)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on CPU; axon override failed")
