"""Distributed tests on the virtual 8-device CPU mesh: branch sweep with
collective argmin, safe-set all-gather, and consistency with the
single-device computation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from car_racing_tpu.parallel import mesh as mesh_mod
from car_racing_tpu.utils.constants import U_DIM, X_DIM


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    return mesh_mod.make_mesh(8)


def _sweep_inputs(S, BR, N, seed=0):
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.normal(0, 0.1, (S, X_DIM)))
    s_refs = jnp.asarray(
        np.cumsum(np.full((S, BR, N), 0.08), axis=-1) + rng.normal(0, 0.01, (S, BR, N))
    )
    ey_refs = jnp.asarray(rng.normal(0, 0.2, (S, BR, N)))
    A = jnp.eye(X_DIM) + 0.01 * jnp.asarray(rng.normal(size=(X_DIM, X_DIM)))
    B = jnp.asarray(0.1 * rng.normal(size=(X_DIM, U_DIM)))
    return x0, s_refs, ey_refs, A, B


def test_mesh_shape(mesh):
    assert mesh.shape == {"scenario": 2, "branch": 4}


def test_branch_sweep_matches_single_device(mesh):
    S, BR, N = 2, 16, 4
    x0, s_refs, ey_refs, A, B = _sweep_inputs(S, BR, N)
    Q = jnp.eye(X_DIM)
    R = jnp.eye(U_DIM)
    w = jnp.asarray(0.8)

    best_idx, best_U = mesh_mod.branch_sweep(mesh, x0, s_refs, ey_refs, A, B, Q, R, w, N)

    # single-device oracle: same per-branch QP, plain vmap + argmin
    for s in range(S):
        costs = []
        zs = []
        for br in range(BR):
            z, c = mesh_mod._branch_tracking_qp(
                A, B, N, Q, R, x0[s], s_refs[s, br], ey_refs[s, br], w, x0.dtype
            )
            costs.append(float(c))
            zs.append(np.asarray(z))
        ref_best = int(np.argmin(costs))
        assert int(best_idx[s]) == ref_best
        np.testing.assert_allclose(np.asarray(best_U[s]), zs[ref_best], atol=1e-8)


def test_safe_set_exchange(mesh):
    lap = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, X_DIM)))
    full = mesh_mod.safe_set_exchange(mesh, lap)
    np.testing.assert_allclose(np.asarray(full), np.asarray(lap))
    # output is fully replicated
    assert full.sharding.is_fully_replicated


def test_scaling_efficiency_artifact(mesh, repo_root):
    """Run the full 256-branch scaling-efficiency measurement on the
    virtual 8-device CPU mesh and record the artifact (SCALING_LOCAL.json).

    Real multi-chip TPU hardware is unavailable in this environment (one
    chip behind a tunnel), so the BASELINE >= 0.8 multi-host efficiency
    target cannot be measured on silicon; this measures the same harness on
    8 virtual CPU devices — validating the sharded program end-to-end and
    recording the numbers — while bench.py reports single-TPU branch
    throughput.  Virtual-device efficiency is NOT asserted against 0.8:
    8 'devices' here share one CPU's cores, so per-device throughput
    necessarily drops."""
    import json
    import os

    from car_racing_tpu.parallel import scaling

    report = scaling.scaling_efficiency(branches=256, horizon=10)
    assert report["n_devices"] == 8
    assert report["single"]["branches"] == 256
    assert report["multi"]["branches"] == 512  # 2 scenarios x 256
    assert np.isfinite(report["efficiency"]) and report["efficiency"] > 0
    with open(os.path.join(repo_root, "SCALING_LOCAL.json"), "w") as fh:
        json.dump(
            {"note": "8 virtual CPU devices (one real TPU chip available; "
                     "multi-chip unavailable) — harness validation, not a "
                     "silicon efficiency claim", **report},
            fh, indent=1,
        )


def test_scaling_efficiency_harness(mesh):
    """The sweep must run at 1 device and 8 devices with identical results
    (the correctness half of the scaling-efficiency story; timing runs on
    real hardware in bench)."""
    S, BR, N = 2, 16, 4
    x0, s_refs, ey_refs, A, B = _sweep_inputs(S, BR, N, seed=3)
    Q = jnp.eye(X_DIM)
    R = jnp.eye(U_DIM)
    w = jnp.asarray(0.8)
    mesh1 = mesh_mod.make_mesh(1)
    b1, U1 = mesh_mod.branch_sweep(mesh1, x0, s_refs, ey_refs, A, B, Q, R, w, N)
    b8, U8 = mesh_mod.branch_sweep(mesh, x0, s_refs, ey_refs, A, B, Q, R, w, N)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b8))
    np.testing.assert_allclose(np.asarray(U1), np.asarray(U8), atol=1e-8)
