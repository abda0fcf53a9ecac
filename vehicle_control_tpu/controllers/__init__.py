from vehicle_control_tpu.controllers.mpc.controllers import (
    CascadedKinematicMPC,
    CascadedMPC,
    KinematicMPC,
    SingleTrackMPC,
)

__all__ = [
    "CascadedMPC",
    "CascadedKinematicMPC",
    "KinematicMPC",
    "SingleTrackMPC",
]
