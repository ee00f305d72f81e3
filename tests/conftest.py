"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU analogue of the reference's mock-camera trick (SURVEY.md §4):
multi-chip sharding paths are exercised without TPU hardware by forcing the
CPU platform with 8 virtual devices.

NOTE: this environment's sitecustomize imports jax at interpreter start (the
axon TPU plugin), so env vars like JAX_PLATFORMS are already consumed —
``jax.config.update`` is the reliable override.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any spawned subprocesses

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent compilation cache so repeated test runs skip XLA compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
