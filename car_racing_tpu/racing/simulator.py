"""Offboard batch simulator (reference car_racing/racing/offboard.py:103-131).

Multi-vehicle lockstep loop with lap detection and ``one_lap`` early stop.
The host loop only orchestrates; all numerics inside each vehicle step are
jitted kernels.
"""

from __future__ import annotations

import pickle

import numpy as np


class CarRacingSim:
    def __init__(self):
        self.track = None
        self.vehicles = {}
        self.opti_traj_xglob = None
        self.timestep = None

    def set_timestep(self, dt):
        self.timestep = dt

    def set_track(self, track):
        self.track = track

    def set_opti_traj(self, opti_traj_xglob):
        self.opti_traj_xglob = opti_traj_xglob

    def add_vehicle(self, vehicle):
        self.vehicles[vehicle.name] = vehicle
        vehicle.set_track(self.track)
        vehicle.set_timestep(self.timestep)

    def sim(self, sim_time=50.0, one_lap=False, one_lap_name=None):
        if one_lap:
            current_lap = self.vehicles[one_lap_name].laps
        for _ in range(int(sim_time / self.timestep)):
            for name in self.vehicles:
                self.vehicles[name].forward_one_step(self.vehicles[name].realtime_flag)
            if one_lap and self.vehicles[one_lap_name].laps > current_lap:
                break

    # ---- persistence (reference drivers pickle the whole simulator) ----

    def save(self, path):
        with open(path, "wb") as fh:
            pickle.dump(self, fh, protocol=pickle.HIGHEST_PROTOCOL)

    @staticmethod
    def load(path):
        with open(path, "rb") as fh:
            return pickle.load(fh)

    # ---- trajectory extraction (used by plotting and tests) -------------

    def full_trajectory(self, name, kind="xcurv"):
        """Stack all completed laps + the running lap into one array
        (the loops at offboard.py:133-164 as array ops)."""
        veh = self.vehicles[name]
        rows = []
        src_laps = veh.xcurvs if kind == "xcurv" else veh.xglobs
        src_lap = veh.lap_xcurvs if kind == "xcurv" else veh.lap_xglobs
        for lap in src_laps:
            rows.extend(lap[:-1])
        rows.extend(src_lap)
        return np.asarray(rows)
