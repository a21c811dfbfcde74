"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware isn't available in CI; sharding/collective paths are
validated on host platform devices (SURVEY.md §4).  Two knobs are needed:
the XLA flag must be in the env before jax initializes its CPU client, and
the platform selection must be forced via ``jax.config`` because this image's
sitecustomize registers an ``axon`` TPU plugin that overrides ``JAX_PLATFORMS``
from the environment.  Tests must never touch the real TPU: the axon tunnel is
single-client and a test run would wedge the chip the benchmarks need.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import json  # noqa: E402
import pathlib  # noqa: E402

import pytest  # noqa: E402

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden_core():
    with open(GOLDEN_DIR / "golden_core.json") as f:
        return json.load(f)
