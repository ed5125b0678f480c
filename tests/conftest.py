"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on `xla_force_host_platform_device_count=8` CPU devices (the
driver separately dry-run-compiles the multi-chip path, see
`__graft_entry__.py`). Must set env vars before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The container's sitecustomize imports jax and registers the axon TPU
# backend before conftest runs, so the env var alone is not enough.
jax.config.update("jax_platforms", "cpu")
# Newer jax/axon images drop `--xla_force_host_platform_device_count`
# from XLA_FLAGS handling entirely (jax is pre-imported before user
# env applies); `jax_num_cpu_devices` is the supported route. Without
# this, every `devices8` test silently SKIPS instead of running.
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # backends already initialized (e.g. pytest re-entry)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables between test modules.

    The full suite compiles many hundreds of distinct XLA CPU programs
    in one process; past ~190 tests the accumulated compiler/JIT state
    made `backend_compile_and_load` segfault deterministically (always
    the same test, only in the full run — every <=13-file subset
    passes). Dropping jit caches per module keeps the live-executable
    population bounded; cross-module recompiles are cheap because
    modules rarely share traced shapes."""
    yield
    jax.clear_caches()
    import gc

    gc.collect()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]


def random_dataset(rng, d=32, n=1000, m=4, h=16, pq=False):
    """Random (X, C, B) triple — the reference's universal test fixture
    (`test/common.jl:3-9`)."""
    X = rng.standard_normal((n, d), dtype=np.float32)
    ds = d // m if pq else d
    C = rng.standard_normal((m, h, ds), dtype=np.float32)
    B = rng.integers(0, h, size=(n, m), dtype=np.int32)
    return X, C, B


@pytest.fixture(scope="session")
def dataset(rng):
    return random_dataset(rng)
