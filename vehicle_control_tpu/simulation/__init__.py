from vehicle_control_tpu.simulation.racing import (
    KinematicRacingSimulator,
    RacingSimulator,
)
from vehicle_control_tpu.simulation.closed_loop import make_racing_loop

__all__ = ["RacingSimulator", "KinematicRacingSimulator", "make_racing_loop"]
