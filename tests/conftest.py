"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via the JAX-standard
``xla_force_host_platform_device_count`` idiom (SURVEY.md §4). Must be set
before jax initializes a backend, hence the top-of-conftest placement.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin (sitecustomize) sets jax_platforms programmatically,
# overriding the env var — force CPU back via the config API before any
# backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# Persistent compilation cache: the suite is dominated by recompiles of the
# same tower/step programs across test modules (~10min cold); cache compiled
# executables on disk so repeat runs land under half that (VERDICT.md #10).
from summer_clip_tpu.core.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(os.environ.get("JAX_TEST_COMPILATION_CACHE"))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    import jax

    devs = jax.devices()
    assert len(devs) >= 8, f"expected >=8 virtual devices, got {len(devs)}"
    return devs[:8]
