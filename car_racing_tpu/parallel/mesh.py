"""Device-mesh parallelism: branch/scenario sweeps over TPU meshes.

The reference's parallelism is one OS process per overtake branch with
results gathered through Manager dicts (overtake_traj_planner.py:177-204)
plus ROS pub/sub between realtime nodes.  The TPU-native design (SURVEY §2
parallelism inventory): branch batches are vmapped per chip and sharded
across a mesh with ``shard_map``; best-branch selection and safe-set
exchange ride XLA collectives over ICI.

Axes:
- ``scenario`` — data parallelism over independent simulations / vehicles
  (the DP analog for this workload).
- ``branch``   — the overtake-corridor sweep (scenario/branch parallelism).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import ipm, ocp
from ..utils.constants import U_DIM, X_DIM


def make_mesh(n_devices: int | None = None):
    """Build a ('scenario', 'branch') mesh over the first n devices."""
    devs = jax.devices()[: (n_devices or len(jax.devices()))]
    n = len(devs)
    n_scen = 2 if n % 2 == 0 and n >= 4 else 1
    shape = (n_scen, n // n_scen)
    return Mesh(np.asarray(devs).reshape(shape), ("scenario", "branch"))


def _branch_tracking_qp(A, B, N, Q, R, x0, s_ref, ey_ref, width, dtype):
    """A per-branch condensed QP (progress + reference tracking + bounds) —
    the compute kernel each mesh shard vmaps over its local branches."""
    A_seq, B_seq, C_seq = ocp.lti_sequences(A, B, N)
    phi, G = ocp.condense(A_seq, B_seq, C_seq, x0)
    n_u = N * U_DIM
    sel_s = jnp.arange(N) * X_DIM + 4
    sel_ey = jnp.arange(N) * X_DIM + 5
    G_s, p_s = G[sel_s], phi[sel_s]
    G_ey, p_ey = G[sel_ey], phi[sel_ey]
    H = 2 * 20.0 * (G_ey.T @ G_ey + G_s.T @ G_s) + 1e-6 * jnp.eye(n_u, dtype=dtype)
    g = 2 * 20.0 * (G_ey.T @ (p_ey - ey_ref) + G_s.T @ (p_s - s_ref))
    g = g - 200.0 * G[-X_DIM + 4]
    I_u = jnp.eye(n_u, dtype=dtype)
    C = jnp.concatenate([I_u, -I_u, G_ey, -G_ey], axis=0)
    d = jnp.concatenate(
        [
            jnp.tile(jnp.asarray([-0.5, -1.5], dtype), N),
            -jnp.tile(jnp.asarray([0.5, 1.5], dtype), N),
            -width - p_ey,
            p_ey - width,
        ]
    )
    qp = ipm.QP(H=H, g=g, C=C, d=d, E=jnp.zeros((0, n_u), dtype), e=jnp.zeros(0, dtype))
    sol = ipm.solve_qp(qp, jnp.zeros(n_u, dtype), iters=20)
    cost = 0.5 * sol.z @ H @ sol.z + g @ sol.z
    return sol.z, cost


def branch_sweep(mesh: Mesh, x0_scen: jax.Array, s_refs: jax.Array, ey_refs: jax.Array,
                 A: jax.Array, B: jax.Array, Q: jax.Array, R: jax.Array,
                 width: jax.Array, num_horizon: int = 10):
    """Sharded racing-game branch sweep + best-branch selection.

    x0_scen: (S, X_DIM) per-scenario ego states (sharded over 'scenario');
    s_refs/ey_refs: (S, BR, N) per-branch references (BR sharded over
    'branch').  Returns (best_idx (S,), best_U (S, N*U_DIM)) — the argmin
    reduction replaces the reference's host-side gather over Manager dicts.
    """
    N = num_horizon
    dtype = x0_scen.dtype

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("scenario"), P("scenario", "branch"), P("scenario", "branch")),
        out_specs=(P("scenario"), P("scenario")),
        check_vma=False,  # the QP solver's scan carry mixes varying/invariant
    )
    def sweep(x0_l, s_ref_l, ey_ref_l):
        def per_scen(x0, s_ref_b, ey_ref_b):
            solve = lambda sr, er: _branch_tracking_qp(
                A, B, N, Q, R, x0, sr, er, width, dtype
            )
            zs, costs = jax.vmap(solve)(s_ref_b, ey_ref_b)
            # global best across the branch axis: gather all shard costs
            all_costs = jax.lax.all_gather(costs, "branch", tiled=False).reshape(-1)
            best = jnp.argmin(all_costs)
            n_local = costs.shape[0]
            my_rank = jax.lax.axis_index("branch")
            local_best = best - my_rank * n_local
            has_best = (local_best >= 0) & (local_best < n_local)
            z_best = jnp.where(
                has_best, zs[jnp.clip(local_best, 0, n_local - 1)], jnp.zeros_like(zs[0])
            )
            # sum across shards: only the owner contributes non-zeros
            z_best = jax.lax.psum(z_best, "branch")
            return best, z_best

        return jax.vmap(per_scen)(x0_l, s_ref_l, ey_ref_l)

    return jax.jit(sweep)(x0_scen, s_refs, ey_refs)


def safe_set_exchange(mesh: Mesh, lap_traj: jax.Array):
    """All-gather each scenario shard's newest lap trajectory so every
    device holds the full safe set (the LMPC safe-set exchange of SURVEY
    §5.8; replaces pickle/ROS transport).  Expressed as a resharding —
    XLA inserts the all-gather collective over ICI."""
    sharded = jax.device_put(lap_traj, NamedSharding(mesh, P("scenario")))
    return jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(sharded)


def dryrun(n_devices: int) -> None:
    """One full multi-chip step on tiny shapes: 256-branch sweep sharded
    over ('scenario','branch') + collective best-branch selection + safe-set
    all-gather.  Used by the driver's multichip dry run."""
    mesh = make_mesh(n_devices)
    S = mesh.shape["scenario"]
    BR_total = 256
    N = 4  # tiny horizon for the dry run
    dtype = jnp.float32

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(0, 0.1, (S, X_DIM)), dtype)
    base_s = np.cumsum(np.full((S, BR_total, N), 0.08), axis=-1)
    s_refs = jnp.asarray(base_s + rng.normal(0, 0.01, (S, BR_total, N)), dtype)
    ey_refs = jnp.asarray(rng.normal(0, 0.2, (S, BR_total, N)), dtype)
    A = jnp.eye(X_DIM, dtype=dtype) + 0.01 * jnp.asarray(rng.normal(size=(X_DIM, X_DIM)), dtype)
    B = jnp.asarray(0.1 * rng.normal(size=(X_DIM, U_DIM)), dtype)
    Q = jnp.eye(X_DIM, dtype=dtype)
    R = jnp.eye(U_DIM, dtype=dtype)

    best_idx, best_U = branch_sweep(
        mesh, x0, s_refs, ey_refs, A, B, Q, R, jnp.asarray(0.8, dtype), num_horizon=N
    )
    jax.block_until_ready((best_idx, best_U))
    assert best_idx.shape == (S,)
    assert best_U.shape == (S, N * U_DIM)

    lap = jnp.asarray(rng.normal(size=(S, 8, X_DIM)), dtype)
    full = safe_set_exchange(mesh, lap)
    jax.block_until_ready(full)
    assert full.shape == (S, 8, X_DIM)
    print(
        f"dryrun ok: mesh={dict(mesh.shape)} branches={BR_total} "
        f"best={np.asarray(best_idx)}"
    )
