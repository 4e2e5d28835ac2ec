"""Test harness config: force CPU with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``), the strategy the
reference lacks entirely (it hardcodes NCCL, reference tools.py:317);
see SURVEY.md §4 for the test pyramid this suite implements.

Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session env may pin a TPU platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon already latched; the env write above is too late for
# that copy of the config, so override it at runtime as well.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite's wall time is dominated by XLA:CPU
# compiles of the cascade (~20 min cold); warm reruns drop to minutes.
# Entries are keyed by platform, so sharing the TPU cache dir is safe.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_camera(rng, fx=320.0, fy=320.0, cx=80.0, cy=64.0, angle=0.1, t=None):
    """A plausible pinhole camera as the reference's (2,4,4) stack."""
    intr = np.array(
        [[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1, 0], [0, 0, 0, 0]], np.float32
    )
    c, s = np.cos(angle), np.sin(angle)
    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    ext[:3, 3] = np.asarray(t if t is not None else [0.1, 0.05, 0.2], np.float32)
    out = np.zeros((2, 4, 4), np.float32)
    out[0] = ext
    out[1] = intr
    return out
