"""Default-run TRACE coverage for every Pallas kernel factory.

Interpret-mode *execution* of the in-kernel AD is impractically slow on CPU
(see test_backward_kernel.py), but ``jax.eval_shape`` still runs the Python
kernel body to build its jaxpr — catching scope bugs, shape mismatches and
closure regressions in seconds without lowering to Mosaic.  Numerical parity
on hardware stays with scripts/verify_kernels_tpu.py.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vehicle_control_tpu.controllers.mpc import problems
from vehicle_control_tpu.environment.track import Track
from vehicle_control_tpu.solvers import ALILQRConfig
from vehicle_control_tpu.solvers.backward_kernel_fm import B_TILE
from vehicle_control_tpu.utils.config import load_config, project_root

FAMILIES = [
    ("singletrack", "none", False),
    ("cascaded", "pm", True),
]
# tracing the in-kernel AD costs minutes per family even at H=3; default CI
# covers the hot path + the richest cost variant, the rest behind the gate
if os.environ.get("RUN_KERNEL_TESTS"):
    FAMILIES += [
        ("cascaded", "pm", False),
        ("cascaded_kinematic", "kc", False),
        ("kinematic", None, True),
    ]


def _cfg(rel):
    return load_config(os.path.join(project_root(), "configs", rel))


def _build(track, name, tail, obstacles):
    if name == "kinematic":
        cfg = dict(_cfg("controllers/kinematic.yaml"), obstacles=obstacles)
        cfg["horizon"] = 4
        car = _cfg("models/kinematic_car.yaml")
        return problems.build_kinematic_problem(car, track, cfg, jnp.float32)
    cfg = dict(_cfg(f"controllers/{name}.yaml"), obstacles=obstacles)
    cfg["horizon"] = 3
    if tail == "pm":
        cfg["horizon_pm"] = 2
    elif tail == "kc":
        cfg["horizon_kc"] = 2
    car = _cfg("models/dynamic_car.yaml")
    return problems.build_cascaded_problem(car, track, cfg, tail, jnp.float32)


@pytest.mark.parametrize("name,tail,obstacles", FAMILIES)
def test_all_kernel_factories_trace(ippodromo_track, name, tail, obstacles):
    prob = _build(ippodromo_track, name, tail, obstacles)
    H, nz, nu, nc = prob.horizon, prob.nz, prob.nu, prob.nc
    B = B_TILE
    f32 = jnp.float32
    X = jax.ShapeDtypeStruct((B, H, nz), f32)
    U = jax.ShapeDtypeStruct((B, H, nu), f32)
    lam = jax.ShapeDtypeStruct((B, H, nc), f32)
    mu = jax.ShapeDtypeStruct((B,), f32)
    rho = jax.ShapeDtypeStruct((B,), f32)
    curv = jax.ShapeDtypeStruct((B, H), f32)
    ds = jax.ShapeDtypeStruct((B, H), f32)
    z0 = jax.ShapeDtypeStruct((B, nz), f32)

    bw = prob.backward_kernel_factory()
    out = jax.eval_shape(lambda *a: bw(*a), X, U, lam, mu, rho, curv, ds)
    assert out[0].shape == (B, H, nu)  # kff

    ls = prob.linesearch_kernel_factory([1.0, 0.3, 0.1])
    kff = jax.ShapeDtypeStruct((B, H, nu), f32)
    kfb = jax.ShapeDtypeStruct((B, H, nu, nz), f32)
    jax.eval_shape(lambda *a: ls(*a), X, U, kff, kfb, lam, mu, curv, ds, z0)

    # the whole-solve kernel unrolls several inner passes even at 1x1, so
    # trace it only on the two structurally richest variants to keep the
    # default suite fast (the others share the same run_inner body)
    if (name, obstacles) in (("singletrack", False), ("cascaded", True)):
        sk = prob.solve_kernel_factory(
            ALILQRConfig(n_outer=1, n_inner=1, n_polish=1)
        )
        out = jax.eval_shape(lambda *a: sk(*a), z0, U, lam, curv, ds)
        assert out[0].shape == (B, H, nz)  # X
        assert out[5].shape == (B,)  # converged


def test_stage_derivs_cols_analytic_matches_ad(ippodromo_track):
    """The singletrack family's closed-form stash columns equal the jvp
    columns they replace (checked against a family with the shortcut
    disabled)."""
    from vehicle_control_tpu.solvers.fm_family import (
        build_cascaded_family,
        stage_derivs_cols,
    )

    cfg = dict(_cfg("controllers/singletrack.yaml"), obstacles=False)
    cfg["horizon"] = 3
    car = _cfg("models/dynamic_car.yaml")
    fam = build_cascaded_family(car, cfg, "none", ippodromo_track.data)
    fam_ad = fam._replace(analytic_cols=None)

    rng = np.random.default_rng(0)
    shape = (8, 128)
    wf = tuple(
        jnp.asarray(rng.uniform(-1, 1, shape), jnp.float32) + (5.0 if i == 0 else 0.0)
        for i in range(fam.NZ + fam.NU)
    )
    lam = [jnp.asarray(rng.uniform(0, 1, shape), jnp.float32) for _ in range(fam.NC)]
    mu = jnp.full(shape, 10.0, jnp.float32)
    kv = jnp.full(shape, 0.02, jnp.float32)
    ds = jnp.full((fam.H,) + shape, 0.5, jnp.float32)
    ds_read = lambda i: ds[i]
    n = jnp.asarray(1)

    g1, H1, J1 = jax.jit(
        lambda wf, lam, mu, kv: stage_derivs_cols(fam, n, wf, lam, mu, kv, ds_read)
    )(wf, lam, mu, kv)
    g2, H2, J2 = jax.jit(
        lambda wf, lam, mu, kv: stage_derivs_cols(fam_ad, n, wf, lam, mu, kv, ds_read)
    )(wf, lam, mu, kv)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    for col in (8, 9):
        for r in range(fam.NZ + fam.NU):
            np.testing.assert_allclose(
                np.asarray(H1[col][r]), np.asarray(H2[col][r]), rtol=1e-4, atol=1e-4
            )
        for r in range(fam.NZ):
            np.testing.assert_allclose(
                np.asarray(J1[col][r]), np.asarray(J2[col][r]), rtol=1e-5, atol=1e-6
            )
