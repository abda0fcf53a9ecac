"""The problem closures must be batch-polymorphic: calling them with a
leading batch axis must equal vmapping the per-sample call.  This is the
contract the SoA/Pallas execution paths build on."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vehicle_control_tpu.controllers.mpc import problems
from vehicle_control_tpu.utils.config import load_config, project_root


def _cfg(rel):
    return load_config(os.path.join(project_root(), "configs", rel))


@pytest.mark.parametrize("family", ["pm", "kc", "none", "kin"])
def test_batched_equals_vmapped(family, ippodromo_track):
    if family == "kin":
        prob = problems.build_kinematic_problem(
            _cfg("models/kinematic_car.yaml"), ippodromo_track,
            dict(_cfg("controllers/kinematic.yaml"), obstacles=True),
        )
    else:
        base = {
            "pm": "controllers/cascaded.yaml",
            "kc": "controllers/cascaded_kinematic.yaml",
            "none": "controllers/singletrack.yaml",
        }[family]
        cfg = dict(_cfg(base), obstacles=True)
        cfg["horizon"] = 6
        if family == "pm":
            cfg["horizon_pm"] = 5
        if family == "kc":
            cfg["horizon_kc"] = 5
        prob = problems.build_cascaded_problem(
            _cfg("models/dynamic_car.yaml"), ippodromo_track, cfg, family
        )

    rng = np.random.default_rng(1)
    B = 7
    Z = jnp.asarray(rng.normal(size=(B, prob.nz)) + 4.0)
    U = jnp.asarray(rng.normal(size=(B, prob.nu)) * 0.3)
    x0, u0 = prob.initial_prediction()
    params, _ = prob.init_horizon(
        jnp.asarray(np.abs(rng.normal(size=(prob.nz - 2,))) + 3.0), x0, u0
    )
    for n in [0, prob.horizon // 2, prob.horizon - 1]:
        for fn in prob.fns:
            direct = fn(jnp.asarray(n), Z, U, params)
            vmapped = jax.vmap(lambda z, u: fn(jnp.asarray(n), z, u, params))(Z, U)
            np.testing.assert_allclose(
                np.asarray(direct), np.asarray(vmapped), atol=1e-12,
                err_msg=f"{family} stage {n} {fn}",
            )
