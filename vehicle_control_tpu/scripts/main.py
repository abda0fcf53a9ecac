"""Racing entry point (reference: vehicle_control/scripts/main.py).

Usage: python -m vehicle_control_tpu.scripts.main [--track NAME] [--steps N]
Reads configs/simconfig.yaml for controller selection and run options.
"""

import argparse
import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)

from vehicle_control_tpu.simulation import RacingSimulator
from vehicle_control_tpu.utils.config import load_config, project_root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--track", default=None, help="override simconfig track_name")
    ap.add_argument("--steps", type=int, default=2500)
    args = ap.parse_args()

    root = project_root()
    simconfig = load_config(os.path.join(root, "configs/simconfig.yaml"))
    if args.track:
        simconfig["track_name"] = args.track
    trackconfig = load_config(
        os.path.join(root, f"configs/environment/{simconfig['track_name']}.yaml")
    )
    carconfig = load_config(os.path.join(root, "configs/models/dynamic_car.yaml"))
    sim = RacingSimulator(simconfig, carconfig, trackconfig)
    if simconfig.get("load", False):
        # replay a saved run instead of re-simulating (reference:
        # simconfig.load, simulator.py:24-27 / racing.py:452-459)
        sim.load()
    else:
        sim.run(max_steps=args.steps)
    sim.summarize()
    if simconfig.get("save_gif", False):
        from vehicle_control_tpu.simulation.render import render_racing_gif

        render_racing_gif(sim)


if __name__ == "__main__":
    main()
