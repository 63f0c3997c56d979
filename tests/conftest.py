"""Test config: force JAX onto a virtual 8-device CPU mesh.

Device-path tests exercise the same sharding code that runs on a real
TPU pod slice; CI has no TPUs, so we use XLA's host-platform device
trick. Must run before the first ``import jax`` anywhere.
"""

import os
import pathlib

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config
# knob does work. Must happen before any backend initialization.
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import pytest  # noqa: E402

VECTORS = pathlib.Path(
    os.environ.get("LZ4TPU_VECTORS", "/root/reference/test_vectors_lz4")
)


@pytest.fixture(scope="session")
def vectors_dir() -> pathlib.Path:
    if not VECTORS.is_dir():
        pytest.skip(f"test vector directory not found: {VECTORS}")
    return VECTORS


def good_vector_names():
    if not VECTORS.is_dir():
        return []
    return sorted(
        p.stem
        for p in VECTORS.glob("*.lz4")
        if (VECTORS / (p.stem + ".bin")).exists()
    )


def error_vector_names():
    if not VECTORS.is_dir():
        return []
    return sorted(
        p.stem
        for p in VECTORS.glob("*.err")
        if (VECTORS / (p.stem + ".eds")).exists()
    )
