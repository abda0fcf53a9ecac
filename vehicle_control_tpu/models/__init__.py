from vehicle_control_tpu.models import (
    differential_drive,
    dynamic_car,
    kinematic_car,
    point_mass,
)
from vehicle_control_tpu.models.differential_drive import DifferentialDrive
from vehicle_control_tpu.models.dynamic_car import DynamicCar, DynamicCarParams
from vehicle_control_tpu.models.kinematic_car import KinematicCar, KinematicCarParams
from vehicle_control_tpu.models.point_mass import DynamicPointMass, PointMassParams

__all__ = [
    "differential_drive",
    "dynamic_car",
    "kinematic_car",
    "point_mass",
    "DifferentialDrive",
    "DynamicCar",
    "DynamicCarParams",
    "KinematicCar",
    "KinematicCarParams",
    "DynamicPointMass",
    "PointMassParams",
]
