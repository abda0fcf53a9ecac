from vehicle_control_tpu.solvers.al_ilqr import (
    ALILQRConfig,
    OCPFunctions,
    Solution,
    build_solver,
    rollout,
)

__all__ = [
    "ALILQRConfig",
    "OCPFunctions",
    "Solution",
    "build_solver",
    "rollout",
]
