"""Test configuration: force a virtual 8-device CPU mesh.

The reference test suite (/root/reference/tests/conftest.py) only registers a CLI
option; our suite additionally makes every test hermetic and able to exercise
multi-chip sharding without TPU hardware, per the framework's SPMD-first design.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Tests must be hermetic: CPU backend with 8 virtual devices.  Setting env
# vars here is too late when a PJRT plugin (the axon TPU tunnel) was already
# registered by sitecustomize at interpreter start — jax would silently run
# every test on one real TPU.  In that case re-exec pytest with the plugin
# disabled.
if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("_MATCHA_TESTS_REEXEC") != "1"
):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["_MATCHA_TESTS_REEXEC"] = "1"
    os.execvpe(
        sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env
    )

# Must run before jax is imported anywhere.  Force CPU even if the ambient
# environment points at a TPU (tests must be hermetic and multi-device).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# torch (CPU) is used as a numerical oracle in parity tests.  Its OpenMP
# runtime can deadlock against XLA's thread pools when both spin up large
# pools, so pin torch to one thread and import it before jax.
os.environ.setdefault("OMP_NUM_THREADS", "1")
try:
    import torch  # noqa: F401

    torch.set_num_threads(1)
except ImportError:
    pass

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
