"""Parameter pytrees for controllers, vehicles and system limits.

Config schema of the framework — the analog of the reference's ``*Param``
classes (car_racing/utils/base.py:121-138,167-186,226-243,272-291,351-408,
659-713), as frozen dataclass pytrees so they pass through jit/vmap.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .constants import X_DIM


def _f(x):
    return jnp.asarray(x, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)


def load_lti(data_dir: str = "data"):
    """Identified LTI (A, B) from CSV (reference base.py:124-125)."""
    A = np.genfromtxt(f"{data_dir}/sys/LTI/matrix_A.csv", delimiter=",")
    B = np.genfromtxt(f"{data_dir}/sys/LTI/matrix_B.csv", delimiter=",")
    return _f(A), _f(B)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SystemParam:
    """Actuation/state limits (reference base.py:708-713)."""

    delta_max: jax.Array
    a_max: jax.Array
    v_max: jax.Array
    v_min: jax.Array

    @staticmethod
    def default() -> "SystemParam":
        return SystemParam(_f(0.5), _f(1.0), _f(10.0), _f(0.0))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CarParam:
    """Vehicle geometry (reference base.py:699-705)."""

    length: jax.Array
    width: jax.Array

    @staticmethod
    def default() -> "CarParam":
        return CarParam(_f(0.4), _f(0.2))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LQRParam:
    """(reference LQRTrackingParam, base.py:121-138)"""

    A: jax.Array
    B: jax.Array
    Q: jax.Array
    R: jax.Array
    vt: jax.Array
    eyt: jax.Array
    max_iter: int = dataclasses.field(metadata=dict(static=True), default=50)

    @staticmethod
    def default(vt=0.6, eyt=0.0, data_dir="data") -> "LQRParam":
        A, B = load_lti(data_dir)
        return LQRParam(
            A=A,
            B=B,
            Q=_f(np.diag([10.0, 0.0, 0.0, 4.0, 0.0, 40.0])),
            R=_f(np.diag([0.1, 0.1])),
            vt=_f(vt),
            eyt=_f(eyt),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ILQRParam:
    """(reference iLQRRacingParam, base.py:167-186)"""

    A: jax.Array
    B: jax.Array
    Q: jax.Array
    R: jax.Array
    vt: jax.Array
    eyt: jax.Array
    max_iter: int = dataclasses.field(metadata=dict(static=True), default=150)
    num_horizon: int = dataclasses.field(metadata=dict(static=True), default=50)

    @staticmethod
    def default(vt=0.6, eyt=0.0, data_dir="data") -> "ILQRParam":
        A, B = load_lti(data_dir)
        return ILQRParam(
            A=A,
            B=B,
            Q=_f(np.diag([10.0, 0.0, 0.0, 4.0, 0.0, 40.0])),
            R=_f(np.diag([0.1, 0.1])),
            vt=_f(vt),
            eyt=_f(eyt),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MPCParam:
    """(reference MPCTrackingParam, base.py:226-243)"""

    A: jax.Array
    B: jax.Array
    Q: jax.Array
    R: jax.Array
    vt: jax.Array
    eyt: jax.Array
    num_horizon: int = dataclasses.field(metadata=dict(static=True), default=10)

    @staticmethod
    def default(vt=0.6, eyt=0.0, data_dir="data") -> "MPCParam":
        A, B = load_lti(data_dir)
        return MPCParam(
            A=A,
            B=B,
            Q=_f(np.diag([10.0, 0.0, 0.0, 4.0, 0.0, 40.0])),
            R=_f(np.diag([0.1, 0.1])),
            vt=_f(vt),
            eyt=_f(eyt),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MPCCBFParam:
    """(reference MPCCBFRacingParam, base.py:272-291)"""

    A: jax.Array
    B: jax.Array
    Q: jax.Array
    R: jax.Array
    vt: jax.Array
    eyt: jax.Array
    alpha: jax.Array
    num_horizon: int = dataclasses.field(metadata=dict(static=True), default=10)

    @staticmethod
    def default(vt=0.6, eyt=0.0, alpha=0.8, data_dir="data") -> "MPCCBFParam":
        A, B = load_lti(data_dir)
        return MPCCBFParam(
            A=A,
            B=B,
            Q=_f(np.diag([10.0, 0.0, 0.0, 4.0, 0.0, 40.0])),
            R=_f(np.diag([0.1, 0.1])),
            vt=_f(vt),
            eyt=_f(eyt),
            alpha=_f(alpha),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LMPCParam:
    """(reference LMPCRacingParam, base.py:351-376)"""

    Q: jax.Array
    R: jax.Array
    Qslack: jax.Array
    dR: jax.Array
    num_ss_points: int = dataclasses.field(metadata=dict(static=True), default=44)
    num_ss_iter: int = dataclasses.field(metadata=dict(static=True), default=2)
    num_horizon: int = dataclasses.field(metadata=dict(static=True), default=12)
    shift: int = dataclasses.field(metadata=dict(static=True), default=0)

    @staticmethod
    def default() -> "LMPCParam":
        return LMPCParam(
            Q=_f(np.zeros((X_DIM, X_DIM))),
            R=_f(np.diag([1.0, 0.25])),
            Qslack=_f(5 * np.diag([10, 0, 0, 1, 10, 0])),
            dR=_f(5 * np.diag([0.8, 0.0])),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RacingGameParam:
    """(reference RacingGameParam, base.py:379-408)"""

    A: jax.Array
    B: jax.Array
    Q: jax.Array
    R: jax.Array
    R_planner: jax.Array
    dR_planner: jax.Array
    safety_factor: jax.Array
    planning_prediction_factor: jax.Array
    alpha: jax.Array
    bezier_order: int = dataclasses.field(metadata=dict(static=True), default=3)
    num_horizon_ctrl: int = dataclasses.field(metadata=dict(static=True), default=10)
    num_horizon_planner: int = dataclasses.field(metadata=dict(static=True), default=10)
    # corridor-hold window: the no-overlap rows stay active while
    # |s_pred - obs_s| <= vehicle_length + corridor_hold.  The reference's
    # implicit 0.15 m releases the corridor as soon as the bumpers clear,
    # which at aggressive closing speeds lets the plan cut back across a
    # car it is still alongside (see PARITY.md "Characterized behavioral
    # limitations"); raising it holds the passing lane longer.  Static so
    # jit caches key on it; default preserves reference behavior.
    corridor_hold: float = dataclasses.field(metadata=dict(static=True), default=0.15)

    @staticmethod
    def default(alpha=0.98, data_dir="data") -> "RacingGameParam":
        A, B = load_lti(data_dir)
        return RacingGameParam(
            A=A,
            B=B,
            Q=_f(np.diag([10.0, 0.0, 0.0, 5.0, 0.0, 50.0])),
            R=_f(np.diag([0.1, 0.1])),
            R_planner=_f(np.diag([5.0, 0.10])),
            dR_planner=_f(5 * np.diag([1.8, 0.0])),
            safety_factor=_f(4.5),
            planning_prediction_factor=_f(0.5),
            alpha=_f(alpha),
        )
