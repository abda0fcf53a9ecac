from vehicle_control_tpu.environment.track import (
    Obstacle,
    Track,
    TrackData,
    Waypoint,
    curvature,
    curvature_derivative,
    obstacle_distances,
    orientation,
    position,
    rel2glob,
)
from vehicle_control_tpu.environment.trajectory import Circle, Trajectory

__all__ = [
    "Obstacle",
    "Track",
    "TrackData",
    "Waypoint",
    "curvature",
    "curvature_derivative",
    "obstacle_distances",
    "orientation",
    "position",
    "rel2glob",
    "Circle",
    "Trajectory",
]
