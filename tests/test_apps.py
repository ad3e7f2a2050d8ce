"""CLI driver smoke tests (the reference's L7 entry scripts as modules)."""

import subprocess
import sys

import numpy as np
import pytest

from car_racing_tpu.models import system_identification as sysid


def test_sysid_linear_regression_recovers_lti():
    """Ridge regression recovers a known LTI system from synthetic data."""
    rng = np.random.default_rng(0)
    A_true = 0.9 * np.eye(6) + 0.02 * rng.normal(size=(6, 6))  # stable
    B_true = 0.1 * rng.normal(size=(6, 2))
    T = 300
    x = np.zeros((T, 6))
    u = 0.1 * rng.normal(size=(T, 2))
    x[0] = rng.normal(size=6) * 0.1
    for k in range(T - 1):
        x[k + 1] = A_true @ x[k] + B_true @ u[k]
    A, B, error = sysid.linear_regression(x, u, lamb=1e-10)
    np.testing.assert_allclose(A, A_true, atol=1e-6)
    np.testing.assert_allclose(B, B_true, atol=1e-6)


@pytest.mark.parametrize(
    "module,extra",
    [
        ("car_racing_tpu.apps.control_test", ["--ctrl-policy", "pid"]),
    ],
)
def test_cli_driver_runs(module, extra, tmp_path, repo_root):
    """Drivers must parse the reference flag surface and run a short sim."""
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv=['x'] + %r;"
        "from %s import main;"
        "import car_racing_tpu.apps.common as c;"
        # shrink sim horizon for CI speed
        "import car_racing_tpu.racing.simulator as s;"
        "orig = s.CarRacingSim.sim;"
        "s.CarRacingSim.sim = lambda self, sim_time=1.0, **kw: orig(self, sim_time=min(sim_time, 3.0), **kw);"
        "main()"
        % (extra + ["--simulation", "--track-layout", "l_shape", "--zero-noise"], module)
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        cwd=repo_root,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
