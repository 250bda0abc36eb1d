"""Test harness config: run everything on a virtual 8-device CPU mesh.

Must set env BEFORE jax is imported anywhere (SURVEY §4: multi-chip tests run
on CPU via --xla_force_host_platform_device_count, reference never needed
this but our collectives do).
"""

import os

_ON_TPU = os.environ.get("PIQUANT_TPU_TEST_TPU", "0") == "1"

# Only force CPU if the caller hasn't explicitly chosen a platform.
# PIQUANT_TPU_TEST_TPU=1 targets the real chip: the kernel/quant subset runs
# COMPILED on hardware (SURVEY §4's "interpret + compiled" requirement):
#
#   PIQUANT_TPU_TEST_TPU=1 python -m pytest tests/test_quant.py \
#       tests/test_full_matrix.py tests/test_qmatmul.py -q
#
# On-chip mode runs without x64 (f64 cases are skipped automatically below);
# multi-device tests skip themselves when fewer than 8 devices exist.
# First run compiles each (shape, dtype, mode) program remotely (~minutes
# for the sub-byte MXU pack kernels); the persistent cache makes reruns fast.
if not _ON_TPU:
    # Force-override: the ambient environment pins JAX_PLATFORMS to the TPU
    # tunnel, which would route every eager op through a remote chip.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _ON_TPU:
    # The axon sitecustomize force-registers the TPU tunnel backend at
    # interpreter start; override it at the config level too.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
# On TPU: NO x64 — the chip has no f64, and x64 tracing trips a jnp
# dispatch recursion on the remote backend (NOTES.md).  f64-parametrized
# cases are skipped via pytest_collection_modifyitems below.
# Persistent compile cache: the op matrix touches many (shape, dtype, mode)
# combinations; caching makes repeat runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/piquant_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.key(0x9032002)  # reference's fixed seed (test/quant.cpp:31)


def pytest_collection_modifyitems(config, items):
    if not _ON_TPU:
        return
    import pytest as _pytest

    skip64 = _pytest.mark.skip(reason="f64/i64 dtypes: no x64 on TPU")
    skip32 = _pytest.mark.skip(
        reason="32-bit quant targets clamp in int64 (reference "
               "quantize.inl:15-18): no x64 on TPU")
    for item in items:
        # match only the bracketed parametrize ids — a test merely NAMED
        # with a dtype (not parametrized over it) must not be skipped
        pid = item.name.split("[", 1)[1] if "[" in item.name else ""
        if ("f64" in pid or "int64" in pid or "uint64" in pid
                or "float64" in pid):
            item.add_marker(skip64)
        elif "int32" in pid:   # matches both int32 and uint32 param ids
            item.add_marker(skip32)


@pytest.fixture(autouse=True)
def _serialize_heavy_interpret(request):
    """Cross-process lock for heavy interpret-mode pallas model tests.

    NOTES.md: interpret-mode model forwards (per-op pallas dispatch over
    io_callback threads) can futex-deadlock when another heavy JAX
    process shares the box.  An exclusive flock on a /tmp lockfile
    serializes every piquant test session's heavy-interpret phase —
    structural replacement for the old "kill stray pytests" workaround.
    Mark tests @pytest.mark.heavy_interpret to opt in."""
    if request.node.get_closest_marker("heavy_interpret") is None:
        yield
        return
    try:
        import fcntl
    except ImportError:  # Windows: no flock; deadlock was Linux-load-bound
        yield
        return
    with open("/tmp/piquant_heavy_interpret.lock", "w") as fh:
        fcntl.flock(fh, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(fh, fcntl.LOCK_UN)
