"""Kinematic racing entry point (reference: vehicle_control/scripts/kinmain.py)."""

import argparse
import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)

from vehicle_control_tpu.simulation import KinematicRacingSimulator
from vehicle_control_tpu.utils.config import load_config, project_root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--track", default=None)
    ap.add_argument("--steps", type=int, default=2500)
    args = ap.parse_args()

    root = project_root()
    simconfig = load_config(os.path.join(root, "configs/simconfig.yaml"))
    simconfig["controller_names"] = ["kinematic"]
    if args.track:
        simconfig["track_name"] = args.track
    trackconfig = load_config(
        os.path.join(root, f"configs/environment/{simconfig['track_name']}.yaml")
    )
    carconfig = load_config(os.path.join(root, "configs/models/kinematic_car.yaml"))
    sim = KinematicRacingSimulator(simconfig, carconfig, trackconfig)
    sim.run(max_steps=args.steps)
    sim.summarize()


if __name__ == "__main__":
    main()
