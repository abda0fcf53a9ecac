from vehicle_control_tpu.utils.config import (
    ConfigDict,
    TrackType,
    load_config,
    project_root,
    save_config,
)
from vehicle_control_tpu.utils.integrators import INTEGRATORS, euler, rk2, rk4
from vehicle_control_tpu.utils.math import safe_div, safe_sqrt, wrap
from vehicle_control_tpu.utils.structs import VectorSpec

__all__ = [
    "ConfigDict",
    "TrackType",
    "load_config",
    "project_root",
    "save_config",
    "INTEGRATORS",
    "euler",
    "rk2",
    "rk4",
    "safe_div",
    "safe_sqrt",
    "wrap",
    "VectorSpec",
]
