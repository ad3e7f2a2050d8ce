"""Realtime node graph over the native msgbus.

Rebuild of the reference's ROS1 stack (car_racing/racing/realtime/*.py and
the mixins in racing/realtime.py) on the C++ broker:

- :class:`SimulatorNode`   (reference realtime/simulator.py:54-83, 100 Hz)
  republishes every vehicle's state and the vehicle list; serves
  ``add_vehicle`` (replacing srv/AddNewVehicle.srv).
- :class:`VehicleNode`     (realtime/vehicle.py:50-106, 100 Hz) steps the
  dynamic bicycle model from the last received input.
- :class:`ControllerNode`  (realtime/controller.py:13-205, 10 Hz) runs a
  tracking policy on the latest simulator state and publishes the input.
- :class:`VisualizationNode` (realtime/visualization.py:14-30) collects
  states and renders frames headlessly; flags vehicles whose state stops
  updating (realtime.py:118-127).

Topics (mirroring the reference's, realtime.py:58,101,232,354):
``track_info``, ``vehicle_list``, ``<veh>/state``, ``simulator/<veh>/state``,
``<veh>/input``.  States travel as float64 arrays [xcurv(6), xglob(6)].

Each node runs its loop in a thread (one process can host several nodes —
the in-process analog of roslaunch) or standalone via ``python -m
car_racing_tpu.realtime.launch``.
"""

from __future__ import annotations

import threading
import time

import numpy as np

from ..ops import track as track_ops
from ..racing import policies, vehicles as veh_mod
from ..utils import params
from ..utils.constants import U_DIM, X_DIM
from .bus import Bus


class Node:
    def __init__(self, port: int, rate_hz: float):
        self.bus = Bus(port=port)
        self.rate_hz = rate_hz
        self._stop = threading.Event()
        self._thread = None

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2.0)
        self.bus.close()

    def _run(self):
        period = 1.0 / self.rate_hz
        next_t = time.monotonic()
        while not self._stop.is_set():
            self.tick()
            next_t += period
            delay = next_t - time.monotonic()
            if delay > 0:
                time.sleep(delay)
            else:
                next_t = time.monotonic()  # overrun: don't spiral

    def tick(self):
        raise NotImplementedError


class SimulatorNode(Node):
    def __init__(self, track, port: int = 9123, rate_hz: float = 100.0):
        super().__init__(port, rate_hz)
        self.track = track
        self.states: dict[str, np.ndarray] = {}
        self._lock = threading.Lock()
        self.bus.serve("add_vehicle", self._on_add_vehicle)

    def _on_add_vehicle(self, arr: np.ndarray) -> np.ndarray:
        # payload: vehicle index encoded as [idx]; state arrives via topic
        name = f"car{int(arr[0])}" if arr[0] >= 1 else "ego"
        self._subscribe_vehicle(name)
        return np.asarray([1.0])

    def register(self, name: str):
        self._subscribe_vehicle(name)

    def _subscribe_vehicle(self, name: str):
        def on_state(state: np.ndarray, name=name):
            with self._lock:
                self.states[name] = state

        self.bus.subscribe_array(f"{name}/state", on_state)

    def tick(self):
        with self._lock:
            snapshot = dict(self.states)
        names = sorted(snapshot)
        for name, state in snapshot.items():
            self.bus.publish_array(f"simulator/{name}/state", state)
        if names:
            self.bus.publish(
                "vehicle_list", ("\x00".join(names)).encode()
            )
        self.bus.publish_array("num_vehicle", np.asarray([float(len(names))]))


class VehicleNode(Node):
    def __init__(self, name: str, track, timestep: float = 0.01,
                 port: int = 9123, rate_hz: float = 100.0, zero_noise: bool = True):
        super().__init__(port, rate_hz)
        self.name = name
        self.model = veh_mod.DynamicBicycleModel(
            name=name, system_param=params.SystemParam.default()
        )
        if zero_noise:
            self.model.set_zero_noise()
        self.model.set_track(track)
        self.model.set_timestep(timestep)
        self.model.set_state_curvilinear(np.zeros(X_DIM))
        self.model.set_state_global(np.zeros(X_DIM))
        self.model.realtime_flag = True
        self._lock = threading.Lock()
        self.bus.subscribe_array(f"{name}/input", self._on_input)

    def _on_input(self, u: np.ndarray):
        with self._lock:
            self.model.u = np.asarray(u[:U_DIM])

    def tick(self):
        with self._lock:
            # realtime semantics (base.py:915-917): no input -> no update
            self.model.forward_dynamics(realtime_flag=True)
            state = np.concatenate([self.model.xcurv, self.model.xglob])
        self.bus.publish_array(f"{self.name}/state", state)


class ControllerNode(Node):
    def __init__(self, name: str, track, policy=None, port: int = 9123,
                 rate_hz: float = 10.0, vt: float = 0.6):
        super().__init__(port, rate_hz)
        self.name = name
        self.policy = policy or policies.PIDTracking(vt=vt)
        self.policy.set_timestep(1.0 / rate_hz)
        self.policy.set_track(track)
        self.policy.agent_name = name
        self._state = None
        self._lock = threading.Lock()
        self.bus.subscribe_array(f"simulator/{name}/state", self._on_state)

    def _on_state(self, state: np.ndarray):
        with self._lock:
            self._state = state

    def tick(self):
        with self._lock:
            state = self._state
        if state is None:
            return
        self.policy.set_state(state[:X_DIM], state[X_DIM:])
        self.policy.calc_input()
        self.bus.publish_array(f"{self.name}/input", self.policy.get_input())


class VisualizationNode(Node):
    """Collects states; flags stale vehicles (realtime.py:118-127)."""

    def __init__(self, port: int = 9123, rate_hz: float = 10.0, stale_after: float = 1.0):
        super().__init__(port, rate_hz)
        self.latest: dict[str, tuple[float, np.ndarray]] = {}
        self.stale: set[str] = set()
        self.stale_after = stale_after
        self._lock = threading.Lock()
        self.bus.subscribe("vehicle_list", self._on_list)
        self._known: set[str] = set()

    def _on_list(self, payload: bytes):
        for name in payload.decode().split("\x00"):
            if name and name not in self._known:
                self._known.add(name)
                self.bus.subscribe_array(
                    f"simulator/{name}/state",
                    lambda s, name=name: self._on_state(name, s),
                )

    def _on_state(self, name: str, state: np.ndarray):
        with self._lock:
            self.latest[name] = (time.monotonic(), state)

    def tick(self):
        now = time.monotonic()
        with self._lock:
            for name, (t, _) in self.latest.items():
                if now - t > self.stale_after:
                    self.stale.add(name)
                else:
                    self.stale.discard(name)


class StagedControllerNode(ControllerNode):
    """Staged lap protocol: PID lap -> MPC-LTI lap -> LMPC
    (reference realtime/controller.py:111-197).

    Lap completion is detected from the simulator-republished state's s
    wrapping; on each stage boundary the active policy is swapped.  (The
    reference's realtime LMPC path calls add_trajectory with an incompatible
    signature and is effectively unfinished — SURVEY §7; here the staged
    node swaps PID -> MPC-LTI and records lap logs so a learning stage can
    attach.)
    """

    def __init__(self, name: str, track, port: int = 9123, rate_hz: float = 10.0,
                 vt: float = 0.6):
        pid = policies.PIDTracking(vt=vt)
        super().__init__(name, track, policy=pid, port=port, rate_hz=rate_hz)
        self._track = track
        self._vt = vt
        self.stage = 0  # 0 = PID, 1 = MPC-LTI
        self._last_s = None
        self.laps_done = 0
        self.lap_log: list[np.ndarray] = []
        self.lap_logs: list[list[np.ndarray]] = []

    def tick(self):
        with self._lock:
            state = self._state
        if state is None:
            return
        s = float(state[4]) % float(self._track.lap_length)
        if self._last_s is not None and s < self._last_s - 0.5 * float(self._track.lap_length):
            # lap completed
            self.laps_done += 1
            self.lap_logs.append(self.lap_log)
            self.lap_log = []
            if self.laps_done == 1 and self.stage == 0:
                mpc = policies.MPCTracking(params.MPCParam.default(vt=self._vt))
                mpc.set_timestep(1.0 / self.rate_hz)
                mpc.set_track(self._track)
                mpc.agent_name = self.name
                self.policy = mpc
                self.stage = 1
        self._last_s = s
        self.lap_log.append(np.array(state))
        self.policy.set_state(state[:X_DIM], state[X_DIM:])
        self.policy.calc_input()
        self.bus.publish_array(f"{self.name}/input", self.policy.get_input())
