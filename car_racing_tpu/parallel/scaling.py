"""Scaling-efficiency harness for branch sweeps (BASELINE metric:
>= 0.8 multi-host efficiency on 256-branch racing-game sweeps).

Measures branch-QP solve throughput at a given mesh size and batch, so the
same harness reports: single-chip solver iterations/s, per-branch latency,
and (on multi-device platforms) the ratio of N-device to 1-device
throughput = scaling efficiency.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from . import mesh as mesh_mod
from ..utils.constants import U_DIM, X_DIM


def sweep_inputs(S, BR, N, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.normal(0, 0.1, (S, X_DIM)), dtype)
    s_refs = jnp.asarray(
        np.cumsum(np.full((S, BR, N), 0.08), axis=-1) + rng.normal(0, 0.01, (S, BR, N)), dtype
    )
    ey_refs = jnp.asarray(rng.normal(0, 0.2, (S, BR, N)), dtype)
    A = jnp.eye(X_DIM, dtype=dtype) + 0.01 * jnp.asarray(rng.normal(size=(X_DIM, X_DIM)), dtype)
    B = jnp.asarray(0.1 * rng.normal(size=(X_DIM, U_DIM)), dtype)
    return x0, s_refs, ey_refs, A, B


def measure_sweep(n_devices: int | None = None, branches: int = 256, horizon: int = 10,
                  reps: int = 20, seed: int = 0, fused: bool = True):
    """Time the full branch sweep (build + batched IPM + collective argmin).

    ``fused=True`` (default) runs the ``reps`` sweeps — each with different
    reference inputs — inside ONE jitted ``lax.scan`` and divides the device
    time: per-call host timing through the TPU tunnel measures dispatch
    (tens of ms under load), not the sweep.  ``fused=False`` keeps the
    per-call-dispatch measurement for comparison.

    Returns dict with per-sweep latency, branch solves/s, and mesh shape.
    """
    mesh = mesh_mod.make_mesh(n_devices)
    S = mesh.shape["scenario"]
    x0, s_refs, ey_refs, A, B = sweep_inputs(S, branches, horizon, seed)
    Q = jnp.eye(X_DIM, dtype=x0.dtype)
    R = jnp.eye(U_DIM, dtype=x0.dtype)
    w = jnp.asarray(0.8, x0.dtype)
    total_branches = S * branches

    if fused:
        rng = np.random.default_rng(seed + 1)
        pert = jnp.asarray(
            rng.normal(0, 0.01, (reps,) + s_refs.shape), s_refs.dtype
        )

        @jax.jit
        def many(pert):
            def body(acc, dp):
                best, bU = mesh_mod.branch_sweep(
                    mesh, x0, s_refs + dp, ey_refs, A, B, Q, R, w, horizon
                )
                return acc + bU.sum() + best.sum().astype(w.dtype), None

            acc, _ = jax.lax.scan(body, jnp.asarray(0.0, w.dtype), pert)
            return acc

        jax.block_until_ready(many(pert))
        best_t = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(many(pert))
            best_t = min(best_t, time.perf_counter() - t0)
        dt = best_t / reps
    else:
        run = lambda: mesh_mod.branch_sweep(
            mesh, x0, s_refs, ey_refs, A, B, Q, R, w, horizon
        )
        jax.block_until_ready(run())
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
    return {
        "mesh": dict(mesh.shape),
        "branches": total_branches,
        "sweep_latency_ms": dt * 1e3,
        "branch_solves_per_s": total_branches / dt,
    }


def scaling_efficiency(branches: int = 256, horizon: int = 10) -> dict:
    """Efficiency of the maximal mesh vs a single device."""
    n = len(jax.devices())
    r1 = measure_sweep(1, branches, horizon)
    rn = measure_sweep(n, branches, horizon)
    eff = (rn["branch_solves_per_s"] / n) / r1["branch_solves_per_s"]
    return {"n_devices": n, "single": r1, "multi": rn, "efficiency": eff}
