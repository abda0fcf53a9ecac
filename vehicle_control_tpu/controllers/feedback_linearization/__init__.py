from vehicle_control_tpu.controllers.feedback_linearization.differential_drive import (
    DFBL,
    FBL,
)

__all__ = ["FBL", "DFBL"]
