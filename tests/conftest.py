"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU analogue of the reference's mock-camera trick (SURVEY.md §4):
multi-chip sharding paths are exercised without TPU hardware by forcing the
CPU platform with 8 virtual devices.

Set ``R3D_TPU_TESTS=1`` to keep the real TPU instead and run the
``tpu``-marked kernel tests (compiled Mosaic kernels, interpret=False) at
reduced sizes:

    R3D_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

Without the env var, tpu-marked tests are skipped and everything else
runs on the CPU mesh.

NOTE: this environment's sitecustomize imports jax at interpreter start (the
axon TPU plugin), so env vars like JAX_PLATFORMS are already consumed —
``jax.config.update`` is the reliable override.
"""

import os

import pytest

TPU_MODE = os.environ.get("R3D_TPU_TESTS") == "1"

if not TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"  # for any spawned subprocesses

import jax

if not TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# persistent compilation cache so repeated test runs skip XLA compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: compiled-kernel tests that need the real TPU "
        "(run with R3D_TPU_TESTS=1 -m tpu)",
    )


def pytest_collection_modifyitems(config, items):
    if TPU_MODE:
        return
    skip_tpu = pytest.mark.skip(reason="needs R3D_TPU_TESTS=1 + real TPU")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)
