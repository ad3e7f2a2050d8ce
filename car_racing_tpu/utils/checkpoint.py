"""Checkpoint / resume for learning state and simulations.

The reference checkpoints by pickling whole simulator/ego objects
(car_racing/tests/control_test.py:37-41, lmpc_test.py:100-161).  Pickle of
the simulator still works here (racing/simulator.py), but the learning
state — the LMPC safe set — gets a structured, portable format: one
compressed ``.npz`` with the sentinel arrays and counters, so checkpoints
survive code refactors and can be sharded/exchanged across hosts (the
array layout is exactly what parallel.mesh.safe_set_exchange gathers).
"""

from __future__ import annotations

import os

import numpy as np


def save_lmpc_state(lmpc, path: str):
    """Snapshot an LMPCRacingGame policy's learning state."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(
        path,
        ss_xcurv=lmpc.ss_xcurv,
        ss_glob=lmpc.ss_glob,
        u_ss=lmpc.u_ss,
        Qfun=lmpc.Qfun,
        time_ss=lmpc.time_ss,
        iter=np.asarray(lmpc.iter),
        time_in_iter=np.asarray(lmpc.time_in_iter),
        lin_points=np.asarray(lmpc.lin_points) if lmpc.lin_points is not None else np.zeros(0),
        lin_input=np.asarray(lmpc.lin_input) if lmpc.lin_input is not None else np.zeros(0),
    )


def load_lmpc_state(lmpc, path: str):
    """Restore a snapshot into an LMPCRacingGame policy (shapes must match
    the policy's configuration)."""
    data = np.load(path)
    lmpc.ss_xcurv = data["ss_xcurv"]
    lmpc.ss_glob = data["ss_glob"]
    lmpc.u_ss = data["u_ss"]
    lmpc.Qfun = data["Qfun"]
    lmpc.time_ss = data["time_ss"]
    lmpc.iter = int(data["iter"])
    lmpc.time_in_iter = int(data["time_in_iter"])
    if data["lin_points"].size:
        lmpc.lin_points = data["lin_points"]
        lmpc.lin_input = data["lin_input"]
    return lmpc


def export_raceline(lmpc, layout: str, data_dir: str = "data"):
    """Export the fastest learned lap as optimal-trajectory CSVs
    (the reference's lmpc_test.py:166-178 save path)."""
    laps = [i for i in range(lmpc.iter) if lmpc.time_ss[i] < 10000]
    best = min(laps, key=lambda i: lmpc.Qfun[0, i])
    T = int(lmpc.time_ss[best])
    os.makedirs(f"{data_dir}/optimal_traj", exist_ok=True)
    np.savetxt(
        f"{data_dir}/optimal_traj/xcurv_{layout}_learned.csv",
        lmpc.ss_xcurv[: T + 1, :, best],
        delimiter=",",
    )
    np.savetxt(
        f"{data_dir}/optimal_traj/xglob_{layout}_learned.csv",
        lmpc.ss_glob[: T + 1, :, best],
        delimiter=",",
    )
    return best
