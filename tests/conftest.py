"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests follow the strategy in SURVEY.md §4: force the host
platform to expose 8 virtual devices so `jax.sharding.Mesh` paths execute and
can be checked against single-device ground truth without TPU hardware.
"""

import os
import sys

# The environment pre-imports jax via sitecustomize with JAX_PLATFORMS=axon
# (a tunneled remote TPU), so plain env vars are too late.  The backend is
# initialized lazily, so overriding the config before the first computation
# still works — force the 8-device virtual CPU platform here.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(items):
    """Auto-mark tests by directory (the reference's unit/integration/e2e
    marker scheme, tests/README.md:33-39)."""
    for item in items:
        path = str(item.fspath)
        for marker in ("unit", "integration", "e2e"):
            if f"/{marker}/" in path:
                item.add_marker(getattr(pytest.mark, marker))

REFERENCE_PKL = "/root/reference/experiments/knowledge_graph_embeddings.pkl"


@pytest.fixture(scope="session")
def reference_pickle_path():
    if not os.path.exists(REFERENCE_PKL):
        pytest.skip("reference embeddings pickle not available")
    return REFERENCE_PKL


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def sample_query_embedding(rng):
    return rng.standard_normal(384).astype(np.float32)
