"""vehicle_control_tpu: a TPU-native MPC / trajectory-optimization engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference `neverorfrog/vehicle-control` (CasADi/IPOPT vehicle MPC), re-designed
TPU-first:

* pure-jnp Frenet-frame vehicle models (dynamic bicycle with Fiala tires,
  point mass, kinematic bicycle, differential drive);
* an AL-iLQR trajectory optimizer (Riccati backward pass over the
  block-banded KKT) replacing CasADi + IPOPT + MA27;
* scenario batching via ``vmap`` and multi-chip sharding via
  ``jax.sharding.Mesh`` + ``shard_map``;
* closed-loop simulation with ``lax.scan`` and reference-compatible
  experiment artifacts.
"""

__version__ = "0.1.0"

from vehicle_control_tpu import environment, models, utils

__all__ = ["environment", "models", "utils", "__version__"]
