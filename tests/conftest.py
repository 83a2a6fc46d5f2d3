"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(mesh/pjit/shard_map) are exercised without TPU hardware, mirroring how
the driver dry-runs `__graft_entry__.dryrun_multichip`.

Note: this environment's sitecustomize imports jax at interpreter start,
so setting JAX_PLATFORMS here is too late; use jax.config.update instead
(valid until the first backend is initialized).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn
# the axon sitecustomize force-registers the TPU tunnel whenever this
# is set, overriding JAX_PLATFORMS -- tests (and their CLI
# subprocesses) must stay on the virtual-device CPU mesh
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
# CLI subprocess tests must import the package regardless of the cwd a
# previous test left behind
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in os.environ.get("PYTHONPATH", ""):
    os.environ["PYTHONPATH"] = (
        _repo + os.pathsep + os.environ.get("PYTHONPATH", "")).rstrip(
        os.pathsep)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: XLA_FLAGS fallback above

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(1234)


def reference_ffmpeg():
    """Path to the locally built reference ffmpeg, or None."""
    p = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".refbuild", "ffmpeg")
    return p if os.path.exists(p) else None
