"""Auxiliary subsystems: checkpoint/resume and the solve-time recorder."""

import numpy as np
import pytest

from car_racing_tpu.racing import policies
from car_racing_tpu.utils import checkpoint, params, profiling


def _mini_lmpc(tmpdir=None):
    lmpc = policies.LMPCRacingGame(
        params.LMPCParam.default(),
        racing_game_param=params.RacingGameParam.default(),
        timestep=0.1,
        lap_number=3,
        time_lmpc=50 * 0.1,
    )
    return lmpc


def test_lmpc_checkpoint_roundtrip(tmp_path):
    lmpc = _mini_lmpc()
    # populate some learning state
    lmpc.ss_xcurv[:10, :, 0] = np.arange(60).reshape(10, 6)
    lmpc.Qfun[:10, 0] = np.arange(10)[::-1]
    lmpc.time_ss[0] = 9
    lmpc.iter = 1
    lmpc.time_in_iter = 4
    lmpc.lin_points = np.ones((13, 6))
    lmpc.lin_input = np.zeros((12, 2))
    path = str(tmp_path / "lmpc_state.npz")
    checkpoint.save_lmpc_state(lmpc, path)

    fresh = _mini_lmpc()
    checkpoint.load_lmpc_state(fresh, path)
    np.testing.assert_array_equal(fresh.ss_xcurv, lmpc.ss_xcurv)
    np.testing.assert_array_equal(fresh.Qfun, lmpc.Qfun)
    assert fresh.iter == 1 and fresh.time_in_iter == 4
    np.testing.assert_array_equal(fresh.lin_points, lmpc.lin_points)


def test_export_raceline(tmp_path, monkeypatch):
    lmpc = _mini_lmpc()
    lmpc.iter = 2
    lmpc.time_ss[0] = 20
    lmpc.time_ss[1] = 15
    lmpc.Qfun[0, 0] = 20
    lmpc.Qfun[0, 1] = 15  # lap 1 is faster
    lmpc.ss_xcurv[:16, :, 1] = 1.0
    lmpc.ss_glob[:16, :, 1] = 2.0
    best = checkpoint.export_raceline(lmpc, "testtrack", data_dir=str(tmp_path))
    assert best == 1
    out = np.genfromtxt(tmp_path / "optimal_traj" / "xcurv_testtrack_learned.csv", delimiter=",")
    assert out.shape == (16, 6)
    np.testing.assert_allclose(out, 1.0)


def test_solve_timer_percentiles():
    t = profiling.SolveTimer()
    for ms in [1.0, 2.0, 3.0, 100.0]:
        t.record("solve", ms)
    with t.measure("ctx"):
        pass
    s = t.summary()
    assert s["solve"]["count"] == 4
    assert s["solve"]["p50_ms"] == pytest.approx(2.5)
    assert s["solve"]["max_ms"] == 100.0
    assert "ctx" in s
    assert "solve" in t.report()


def test_readme_bench_table_in_sync(repo_root):
    """The README benchmark table is generated from BENCH_LOCAL.json
    (round-3 weak #3: a hand-maintained table drifted within one round);
    at commit time the committed README must match the committed artifact
    — update_readme() must be a no-op."""
    from car_racing_tpu.utils import bench_table

    assert not bench_table.update_readme(repo_root), (
        "README bench table is stale — run "
        "`python -m car_racing_tpu.utils.bench_table` and commit"
    )
