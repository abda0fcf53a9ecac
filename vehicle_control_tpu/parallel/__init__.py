from vehicle_control_tpu.parallel.batch import (
    aligned_carry,
    make_batched_mpc_step,
    make_batched_racing_step,
    make_param_batched_racing_step,
    tile_carry,
)
from vehicle_control_tpu.parallel.mesh import (
    make_sharded_mpc_step,
    scenario_mesh,
)

__all__ = [
    "aligned_carry",
    "make_batched_mpc_step",
    "make_batched_racing_step",
    "make_param_batched_racing_step",
    "tile_carry",
    "make_sharded_mpc_step",
    "scenario_mesh",
]
