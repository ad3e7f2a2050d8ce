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
- :class:`CBFControllerNode` — the reference's realtime mpc-cbf mode
  (realtime/controller.py:31-36,165-185): obstacle states arrive over the
  bus (vehicle_list discovery) and feed constant-velocity predictions into
  the MPC-CBF policy.
- :class:`StagedControllerNode` — the full staged lap protocol of the
  reference's lmpc mode, PID lap -> MPC-LTI lap -> LMPC learning laps
  (realtime/controller.py:111-197).  The reference's own LMPC stage is
  broken (its add_trajectory call signature never matched, SURVEY §7);
  here the node feeds its recorded lap logs into the learning policy.
- :class:`VisualizationNode` (realtime/visualization.py:14-30) collects
  states, optionally renders frames headlessly (set ``render_dir``), and
  flags vehicles whose state stops updating (realtime.py:118-127).

Topics (mirroring the reference's, realtime.py:58,101,232,354):
``track_info``, ``vehicle_list``, ``<veh>/state``, ``simulator/<veh>/state``,
``<veh>/input``.  States travel as float64 arrays [xcurv(6), xglob(6)].

Each node runs its loop in a thread (one process can host several nodes —
the in-process analog of roslaunch) or standalone via ``python -m
car_racing_tpu.realtime.launch``.
"""

from __future__ import annotations

import collections
import threading
import time

import numpy as np

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
        # per-tick wall-time histogram (seconds) — the realtime stack's
        # deadline observability (the reference only prints lap times,
        # realtime/controller.py:129-135)
        self.tick_latencies: collections.deque = collections.deque(maxlen=10000)

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
            t0 = time.monotonic()
            self.tick()
            self.tick_latencies.append(time.monotonic() - t0)
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
    """Collects states, flags stale vehicles (realtime.py:118-127), and —
    when ``render_dir`` is set — renders live frames headlessly: track +
    per-vehicle patches, the FuncAnimation view of the reference
    (realtime/visualization.py:14-30, realtime.py:505-529) without a
    display server."""

    def __init__(self, port: int = 9123, rate_hz: float = 10.0, stale_after: float = 1.0,
                 render_dir: str | None = None, track=None):
        super().__init__(port, rate_hz)
        self.latest: dict[str, tuple[float, np.ndarray]] = {}
        self.stale: set[str] = set()
        self.stale_after = stale_after
        self.render_dir = render_dir
        self.track = track
        self.frames_rendered = 0
        self._fig = None
        self._polys = {}
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

    def _render(self, snapshot: dict[str, np.ndarray]):
        import os

        import matplotlib.patches as patches
        import matplotlib.pyplot as plt

        from ..racing import plotting

        if self._fig is None:
            self._fig, self._ax = plt.subplots()
            if self.track is not None:
                plotting.plot_track(self._ax, self.track, center_line=False)
            self._ax.axis("equal")
            os.makedirs(self.render_dir, exist_ok=True)
        for name, state in snapshot.items():
            if name not in self._polys:
                fc = "red" if name == "ego" else "blue"
                poly = patches.Polygon(np.zeros((4, 2)), closed=True, fc=fc, zorder=10)
                self._ax.add_patch(poly)
                self._polys[name] = poly
            xglob = state[X_DIM:]
            verts = plotting._vehicle_vertices(xglob[4], xglob[5], xglob[3], 0.2, 0.1)
            self._polys[name].set_xy(verts)
            # stale vehicles collapse to a point, like the reference zeroing
            # the patch (realtime.py:118-127)
            if name in self.stale:
                self._polys[name].set_xy(np.zeros((4, 2)))
        path = f"{self.render_dir}/frame_{self.frames_rendered:05d}.png"
        self._fig.savefig(path, dpi=60)
        self.frames_rendered += 1

    def tick(self):
        now = time.monotonic()
        with self._lock:
            snapshot = {name: st for name, (t, st) in self.latest.items()}
            for name, (t, _) in self.latest.items():
                if now - t > self.stale_after:
                    self.stale.add(name)
                else:
                    self.stale.discard(name)
        if self.render_dir and snapshot:
            self._render(snapshot)

    def stop(self):
        super().stop()
        if self._fig is not None:
            import matplotlib.pyplot as plt

            plt.close(self._fig)


class _BusObstacleModel:
    """Obstacle proxy for realtime CBF control: holds the latest state
    received over the bus and forecasts by constant velocity — the realtime
    analog of offboard's get_trajectory_nsteps (offboard.py:51-94)."""

    def __init__(self, name: str, track):
        self.name = name
        self.track = track
        self.param = params.CarParam.default()
        self.xcurv = np.zeros(X_DIM)
        self.xglob = np.zeros(X_DIM)

    def update(self, state: np.ndarray):
        self.xcurv = np.asarray(state[:X_DIM])
        self.xglob = np.asarray(state[X_DIM:])

    def get_trajectory_nsteps(self, time_now, timestep, n):
        from ..ops import dynamics

        import jax.numpy as jnp

        xc, xg = dynamics.const_velocity_prediction(
            self.track, jnp.asarray(self.xcurv), jnp.asarray(self.xglob), timestep, n
        )
        return np.asarray(xc).T, np.asarray(xg).T


class _VehiclesView:
    """Minimal racing_sim adapter for policies running inside realtime
    nodes: exposes just the ``vehicles`` dict the policies read."""

    def __init__(self, vehicles: dict):
        self.vehicles = vehicles


class CBFControllerNode(ControllerNode):
    """Realtime MPC-CBF controller (reference realtime/controller.py:31-36):
    avoids every other vehicle announced on ``vehicle_list``, forecasting
    them by constant velocity from their latest bus states."""

    def __init__(self, name: str, track, port: int = 9123, rate_hz: float = 10.0,
                 vt: float = 0.6):
        policy = policies.MPCCBFRacing(
            params.MPCCBFParam.default(vt=vt), params.SystemParam.default()
        )
        super().__init__(name, track, policy=policy, port=port, rate_hz=rate_hz)
        self._track = track
        self._ego_model = veh_mod.DynamicBicycleModel(
            name=name, system_param=params.SystemParam.default()
        )
        self._ego_model.set_track(track)
        self._vehicles: dict[str, object] = {name: self._ego_model}
        self.policy.set_racing_sim(_VehiclesView(self._vehicles))
        self.bus.subscribe("vehicle_list", self._on_list)

    def _on_list(self, payload: bytes):
        for other in payload.decode().split("\x00"):
            if other and other != self.name and other not in self._vehicles:
                model = _BusObstacleModel(other, self._track)
                self._vehicles[other] = model
                self.bus.subscribe_array(
                    f"simulator/{other}/state",
                    lambda s, model=model: model.update(s),
                )

    def tick(self):
        with self._lock:
            state = self._state
        if state is None:
            return
        self._ego_model.xcurv = np.asarray(state[:X_DIM])
        self._ego_model.xglob = np.asarray(state[X_DIM:])
        self.policy.set_state(state[:X_DIM], state[X_DIM:])
        self.policy.calc_input()
        self.bus.publish_array(f"{self.name}/input", self.policy.get_input())


class _LapLogEgo:
    """Lap-structured log shim with the slice of the ModelBase API that
    LMPCRacingGame.add_trajectory reads (times/xcurvs/xglobs/inputs per
    lap + timestep) — lets the realtime node feed its recorded laps into
    the learning policy exactly like the offboard protocol does."""

    def __init__(self, timestep: float):
        self.timestep = timestep
        self.times: list[list[float]] = []
        self.xcurvs: list[list[np.ndarray]] = []
        self.xglobs: list[list[np.ndarray]] = []
        self.inputs: list[list[np.ndarray]] = []

    def add_lap(self, states: list[np.ndarray], inputs: list[np.ndarray]):
        n = len(states)
        self.times.append([i * self.timestep for i in range(n)])
        self.xcurvs.append([s[:X_DIM] for s in states])
        self.xglobs.append([s[X_DIM:] for s in states])
        self.inputs.append(list(inputs[: n - 1]))


class StagedControllerNode(ControllerNode):
    """Staged lap protocol: PID lap -> MPC-LTI lap -> LMPC learning laps
    (reference realtime/controller.py:111-197).

    Lap completion is detected from the simulator-republished state's s
    wrapping; on each stage boundary the active policy is swapped.  The
    reference's own realtime LMPC stage never worked — it calls
    add_trajectory with a 6-argument signature the 2-argument method can't
    accept (realtime/controller.py:121-128 vs base.py:631) — so this node
    *exceeds* the reference: the recorded lap logs (states + inputs, s made
    lap-local) seed the learning policy's safe set, and every further lap
    is added as it completes.

    **Deadline-safe stage switches.**  The reference builds each stage's
    policy on the controller thread at the lap boundary, so the first
    post-swap solve pays full jit compilation inside a 10 Hz tick.  Here a
    background thread (kicked off at construction, while the PID lap — tens
    of seconds — is still running) pre-builds the MPC-LTI stage's policy
    AND pre-compiles the LMPC stage's kernels against a dummy-seeded
    throwaway policy of identical shapes; the boundary then reuses the
    warm instance / hits the jit cache, and the swap tick stays within the
    budget (tests/test_realtime.py::test_staged_switch_holds_tick_budget).
    """

    def __init__(self, name: str, track, port: int = 9123, rate_hz: float = 10.0,
                 vt: float = 0.6, lap_number: int = 10,
                 opti_traj_xcurv: np.ndarray | None = None,
                 opti_traj_xglob: np.ndarray | None = None):
        pid = policies.PIDTracking(vt=vt)
        super().__init__(name, track, policy=pid, port=port, rate_hz=rate_hz)
        self._track = track
        self._vt = vt
        self.stage = 0  # 0 = PID, 1 = MPC-LTI, 2 = LMPC
        self._last_s = None
        self.laps_done = 0
        self.lap_log: list[np.ndarray] = []
        self.lap_input_log: list[np.ndarray] = []
        self.lap_logs: list[list[np.ndarray]] = []
        self._lap_number = lap_number
        self._log_ego = _LapLogEgo(1.0 / rate_hz)
        self._opti_traj_xcurv = opti_traj_xcurv
        self._opti_traj_xglob = opti_traj_xglob
        self.lmpc: policies.LMPCRacingGame | None = None
        self._prewarmed_mpc: policies.MPCTracking | None = None
        self._prewarm_thread = threading.Thread(target=self._prewarm, daemon=True)
        self._prewarm_thread.start()

    def _build_lmpc(self, dt: float) -> policies.LMPCRacingGame:
        lmpc = policies.LMPCRacingGame(
            params.LMPCParam.default(),
            racing_game_param=params.RacingGameParam.default(),
            system_param=params.SystemParam.default(),
            timestep=dt,
            lap_number=self._lap_number,
            time_lmpc=5000 * dt,
        )
        lmpc.set_track(self._track)
        lmpc.set_timestep(dt)
        if self._opti_traj_xcurv is not None:
            lmpc.set_opti_traj(self._opti_traj_xcurv, self._opti_traj_xglob)
        # the artifact/obstacle view: only the ego exists in this node's
        # world, so the overtake dispatch stays on the pure-LMPC branch
        ego_model = veh_mod.DynamicBicycleModel(
            name="ego", system_param=params.SystemParam.default()
        )
        ego_model.set_track(self._track)
        lmpc.set_racing_sim(_VehiclesView({"ego": ego_model}))
        lmpc.set_vehicles_track()
        lmpc.agent_name = "ego"
        return lmpc

    def _prewarm(self):
        """Compile the later stages' solve kernels off the control thread.

        Runs while the PID lap is in flight.  The MPC-LTI policy instance
        is kept (reused at the boundary); the LMPC policy is a THROWAWAY
        seeded with two synthetic constant-speed laps whose array shapes
        match the real stage exactly — its calc_input populates the jit
        caches (regression, safe-set selection, convex-hull QP), so the
        real policy built at the boundary compiles nothing."""
        dt = 1.0 / self.rate_hz
        try:
            mpc = policies.MPCTracking(params.MPCParam.default(vt=self._vt))
            mpc.set_timestep(dt)
            mpc.set_track(self._track)
            mpc.agent_name = self.name
            mpc.set_state(np.zeros(X_DIM), np.zeros(X_DIM))
            # twice: the first call compiles the cold (u_warm=None) solve,
            # the second the shift-warm-started variant every later tick hits
            mpc.calc_input()
            mpc.calc_input()
            mpc._u_warm = None  # hand over exactly like a fresh policy
            mpc.time = 0.0
            self._prewarmed_mpc = mpc
        except Exception:  # pragma: no cover - prewarm is best-effort
            self._prewarmed_mpc = None

        # separate try: an LMPC prewarm failure must not discard the
        # already-completed MPC prewarm (the stage-0 boundary would then
        # pay the compile spike this thread exists to prevent)
        try:
            lmpc = self._build_lmpc(dt)
            L = float(self._track.lap_length)
            n = 60
            log = _LapLogEgo(dt)
            for _ in range(2):
                states, inputs = [], []
                for i in range(n):
                    st = np.zeros(2 * X_DIM)
                    st[0] = L / ((n - 1) * dt)
                    st[4] = 1.02 * L * i / (n - 1)  # final point crosses L
                    states.append(st)
                    inputs.append(np.zeros(U_DIM))
                log.add_lap(states, inputs)
            lmpc.add_trajectory(log, 0)
            lmpc.add_trajectory(log, 1)
            st = np.zeros(X_DIM)
            st[0] = 0.5
            st[4] = 0.1
            lmpc.set_state(st, np.zeros(X_DIM))
            # fills the jit caches (cold + warm-started solve variants);
            # the instance itself is discarded
            lmpc.calc_input()
            lmpc.calc_input()
        except Exception:  # pragma: no cover - prewarm is best-effort
            pass  # LMPC caches stay cold; the boundary falls back inline

    def _close_lap(self):
        self.laps_done += 1
        self.lap_logs.append(self.lap_log)
        self._log_ego.add_lap(self.lap_log, self.lap_input_log)
        self.lap_log, self.lap_input_log = [], []
        dt = 1.0 / self.rate_hz
        if self.stage == 0:
            # a real PID lap (tens of seconds) dwarfs the prewarm; if the
            # boundary still arrives first (or prewarm failed), fall back to
            # building inline — the reference's behavior — rather than block
            mpc = self._prewarmed_mpc
            if mpc is None:
                mpc = policies.MPCTracking(params.MPCParam.default(vt=self._vt))
                mpc.set_timestep(dt)
                mpc.set_track(self._track)
                mpc.agent_name = self.name
            self.policy = mpc
            self.stage = 1
        elif self.stage == 1:
            lmpc = self._build_lmpc(dt)
            lmpc.add_trajectory(self._log_ego, 0)
            lmpc.add_trajectory(self._log_ego, 1)
            self.policy = lmpc
            self.lmpc = lmpc
            self.stage = 2
        else:
            self.lmpc.add_trajectory(self._log_ego, self.laps_done - 1)

    def tick(self):
        with self._lock:
            state = self._state
        if state is None:
            return
        L = float(self._track.lap_length)
        s = float(state[4]) % L
        lap_state = np.array(state)
        lap_state[4] = s  # lap-local s: realtime vehicles never wrap theirs
        if self._last_s is not None and s < self._last_s - 0.5 * L:
            # lap completed: close the lap with an unwrapped final point so
            # compute_cost sees the crossing (offboard lap logs end > L)
            self.lap_log.append(np.concatenate([lap_state[:4], [s + L], lap_state[5:]]))
            self.lap_input_log.append(np.asarray(self.policy.get_input() if self.policy.u is not None else np.zeros(U_DIM)))
            self._close_lap()
        self._last_s = s
        self.lap_log.append(lap_state)
        self.policy.set_state(lap_state[:X_DIM], lap_state[X_DIM:])
        self.policy.calc_input()
        u = self.policy.get_input()
        self.lap_input_log.append(np.asarray(u))
        self.bus.publish_array(f"{self.name}/input", u)
