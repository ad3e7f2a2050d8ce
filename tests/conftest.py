"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's implication: the reference has no multi-node tests;
we test pod behavior without a pod by forcing the host platform to expose 8
virtual devices.  float64 is enabled so numeric parity tests can compare
against high-precision references.

TPU-gated tier escape hatch: setting ``CAR_RACING_TPU_TEST_PLATFORM=tpu``
keeps the ambient platform (the axon TPU tunnel) instead of forcing CPU —
that is how the bench harness runs tests/test_tpu_native.py on real
silicon (the shipped Pallas-default numerics path has its own gates
there; VERDICT r4 weak #1).  No x64 in that mode: v5e has no f64 linalg.
"""

import os

_TEST_PLATFORM = os.environ.get("CAR_RACING_TPU_TEST_PLATFORM", "cpu")

if _TEST_PLATFORM == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"  # ambient env points at TPU ('axon')
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if _TEST_PLATFORM == "cpu":
    # the axon plugin ignores JAX_PLATFORMS; the config knob wins
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import pytest


@pytest.fixture(scope="session")
def repo_root():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(autouse=True)
def _chdir_repo_root(monkeypatch, repo_root):
    """Data paths are repo-root relative (like the reference's cwd-relative
    CSV loads, base.py:124-125)."""
    monkeypatch.chdir(repo_root)
