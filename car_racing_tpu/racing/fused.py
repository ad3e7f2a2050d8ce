"""Fused on-device closed-loop rollouts.

The reference's simulation loop crosses the Python/C++ boundary at every
control step (offboard.py:124-127 -> IPOPT).  TPU-native deployment fuses
the whole receding-horizon loop — MPC solve, 100 dynamics substeps, state
handoff, warm-start shift — into ONE jitted ``lax.scan``, so a full lap
executes on-device with zero host round-trips.  This is the latency story
for the BASELINE metrics: per-control-step time is total device time /
steps, with no dispatch overhead in the measurement or in production.

Also provides the batched variant (vmap over initial states / scenarios)
used for scaling sweeps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models import controllers
from ..ops import dynamics, ipm, ocp, track as track_ops
from ..utils.constants import U_DIM, X_DIM
from ..utils.params import MPCParam, SystemParam


@partial(jax.jit, static_argnames=("n_steps", "control_dt", "sub_dt"))
def rollout_mpc_tracking(
    track: track_ops.Track,
    bike_params: dynamics.BicycleParams,
    mpc_param: MPCParam,
    sys_param: SystemParam,
    xtarget: jax.Array,
    xcurv0: jax.Array,
    xglob0: jax.Array,
    n_steps: int = 100,
    control_dt: float = 0.1,
    sub_dt: float = 0.001,
):
    """Closed-loop MPC-LTI tracking entirely on-device.

    Each scan step: condensed-QP solve (warm-started by the shifted
    previous solution) -> one control period of Euler substeps.
    Returns (xcurv_traj (n_steps+1, X), u_traj (n_steps, U), kkt_res (n_steps,)).
    """
    N = mpc_param.num_horizon
    dtype = xcurv0.dtype

    def step(carry, _):
        xcurv, xglob, u_warm = carry
        u0, U, _ = controllers.mpc_lti(
            xcurv,
            xtarget,
            mpc_param,
            sys_param,
            track.width.astype(dtype),
            u_warm=u_warm,
            return_traj=True,
        )
        xglob_next, xcurv_next = dynamics.propagate(
            track, bike_params, xglob, xcurv, u0, control_dt=control_dt, sub_dt=sub_dt
        )
        flat = U.reshape(-1)
        u_warm_next = jnp.concatenate([flat[U_DIM:], flat[-U_DIM:]])
        return (xcurv_next, xglob_next, u_warm_next), (xcurv, u0)

    u_warm0 = jnp.zeros(N * U_DIM, dtype)
    (xcurv_T, _, _), (xcurvs, us) = jax.lax.scan(
        step, (xcurv0, xglob0, u_warm0), None, length=n_steps
    )
    xcurvs = jnp.concatenate([xcurvs, xcurv_T[None]], axis=0)
    return xcurvs, us


@partial(jax.jit, static_argnames=("n_steps", "control_dt", "sub_dt"))
def rollout_mpc_tracking_batch(
    track, bike_params, mpc_param, sys_param, xtarget, xcurv0_batch, xglob0_batch,
    n_steps: int = 100, control_dt: float = 0.1, sub_dt: float = 0.001,
):
    """vmap of :func:`rollout_mpc_tracking` over a batch of initial states —
    many simultaneous closed-loop simulations on one chip (scenario DP)."""
    fn = lambda xc, xg: rollout_mpc_tracking(
        track, bike_params, mpc_param, sys_param, xtarget, xc, xg,
        n_steps=n_steps, control_dt=control_dt, sub_dt=sub_dt,
    )
    return jax.vmap(fn)(xcurv0_batch, xglob0_batch)
