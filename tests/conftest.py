"""Test configuration: force a virtual 8-device CPU mesh.

The reference test suite (/root/reference/tests/conftest.py) only registers a CLI
option; our suite additionally makes every test hermetic and able to exercise
multi-chip sharding without TPU hardware, per the framework's SPMD-first design.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Must run before jax initializes its backends.  Force CPU even if the
# ambient environment points at a TPU (tests must be hermetic and
# multi-device).  Note: a PJRT plugin (the axon TPU tunnel) may already be
# REGISTERED by sitecustomize at interpreter start — env vars alone are then
# ignored because jax latched them at import — so the jax.config.update
# below is the authoritative switch (it works as long as no computation has
# run yet, which is the case at conftest time).
# Escape hatch: MATCHA_TESTS_TPU=1 keeps the ambient (TPU) backend so the
# on-device test tier (e.g. compiled Pallas MAS in test_mas_pallas.py) can
# run on real hardware; everything hermetic still passes there too.
_USE_AMBIENT = os.environ.get("MATCHA_TESTS_TPU") == "1"
if not _USE_AMBIENT:
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

if not _USE_AMBIENT:
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception as exc:  # backends already initialized: cannot be hermetic
        raise RuntimeError(
            "jax backends initialized before conftest could force CPU; run "
            "tests with `PALLAS_AXON_POOL_IPS= python -m pytest tests/`"
        ) from exc
jax.config.update("jax_enable_x64", False)

if not _USE_AMBIENT:
    assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
    assert jax.device_count() >= 8, "tests need the 8-device virtual CPU mesh"
