"""Test harness config: run everything on a virtual 8-device CPU mesh.

Must set env BEFORE jax is imported anywhere (SURVEY §4: multi-chip tests run
on CPU via --xla_force_host_platform_device_count, reference never needed
this but our collectives do).
"""

import os

# Only force CPU if the caller hasn't explicitly chosen a platform.
# PIQUANT_TPU_TEST_TPU=1 targets the real chip — EXPERIMENTAL: the suite
# assumes x64 + 8 virtual devices; on the chip many cases fail in the
# harness (x64 tracing recursion), not in the product.  TPU validation
# runs through bench.py / benchmarks/* and the hardware oracle scripts.
if os.environ.get("PIQUANT_TPU_TEST_TPU", "0") != "1":
    # Force-override: the ambient environment pins JAX_PLATFORMS to the TPU
    # tunnel, which would route every eager op through a remote chip.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if os.environ.get("PIQUANT_TPU_TEST_TPU", "0") != "1":
    # The axon sitecustomize force-registers the TPU tunnel backend at
    # interpreter start; override it at the config level too.
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)
# Persistent compile cache: the op matrix touches many (shape, dtype, mode)
# combinations; caching makes repeat runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/piquant_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.key(0x9032002)  # reference's fixed seed (test/quant.cpp:31)
