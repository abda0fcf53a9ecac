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
    # disable fast_derivs on both sides: this test isolates the closed-form
    # stash columns against the generic tangent sweep
    fam = fam._replace(fast_derivs=None)
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


def test_fast_derivs_matches_generic_ad(ippodromo_track):
    """The singletrack restructured-exact derivatives (FMFamily.fast_derivs:
    closed-form quadratic Hessian entries + reduced forward-over-reverse on
    the slip/friction block + sparse dynamics-Jacobian columns) equal the
    generic linearize(grad+dyn) tangent sweep to f32 rounding — including at
    adversarial states (steering stop, speed clamp, saturated tires) and at
    the masked stage 0 / terminal stage."""
    from vehicle_control_tpu.solvers.fm_family import (
        build_cascaded_family,
        stage_derivs_cols,
    )

    cfg = dict(_cfg("controllers/singletrack.yaml"), obstacles=False)
    cfg["horizon"] = 4
    car = _cfg("models/dynamic_car.yaml")
    fam = build_cascaded_family(car, cfg, "none", ippodromo_track.data)
    assert fam.fast_derivs is not None
    fam_slow = fam._replace(fast_derivs=None)

    rng = np.random.default_rng(7)
    shape = (8, 128)
    scales = [8.0, 1.0, 0.5, 0.3, 50.0, 2.0, 0.3, 5.0, 10.0, 2.0, 10.0, 2.0]
    offs = [8.0, 0, 0, 0, 50.0, 0, 0, 5.0, 0, 0, 0, 0]
    wf = [
        jnp.asarray(offs[i] + scales[i] * rng.standard_normal(shape), jnp.float32)
        for i in range(fam.NZ + fam.NU)
    ]
    # adversarial lanes: steering stop (delta exactly at the bound), speed
    # at the solver clamp, saturated tires (large sideslip)
    d_max = float(cfg["state_constraints"]["delta_max"])
    wf[3] = wf[3].at[0, :].set(d_max)
    wf[0] = wf[0].at[1, :].set(1.0)
    wf[1] = wf[1].at[2, :].set(6.0)
    wf = tuple(wf)
    lam = [jnp.asarray(np.abs(rng.standard_normal(shape)), jnp.float32) for _ in range(fam.NC)]
    mu = jnp.full(shape, 100.0, jnp.float32)
    kv = jnp.asarray(0.05 * rng.standard_normal(shape), jnp.float32)
    ds = jnp.asarray(1.0 + 0.5 * np.abs(rng.standard_normal((fam.H,) + shape)), jnp.float32)
    ds_read = lambda i: ds[i]

    def check(f, f_slow, n, seg=None):
        nj = jnp.asarray(n)
        g1, H1, J1 = jax.jit(
            lambda w: stage_derivs_cols(f, nj, w, lam, mu, kv, ds_read, seg=seg)
        )(wf)
        g2, H2, J2 = jax.jit(
            lambda w: stage_derivs_cols(f_slow, nj, w, lam, mu, kv, ds_read, seg=seg)
        )(wf)

        def close(a, b, what):
            a, b = np.asarray(a), np.asarray(b)
            scale = 1.0 + np.abs(b).max()
            np.testing.assert_allclose(
                a, b, rtol=2e-3, atol=2e-3 * scale,
                err_msg=f"stage {n}: {what}",
            )

        for i, (a, b) in enumerate(zip(g1, g2)):
            close(a, b, f"g[{i}]")
        for i in range(f.NZ + f.NU):
            for r in range(f.NZ + f.NU):
                close(H1[i][r], H2[i][r], f"H[{i}][{r}]")
            for r in range(f.NZ):
                close(J1[i][r], J2[i][r], f"J[{i}][{r}]")

    for n in (0, 1, fam.H - 1):
        check(fam, fam_slow, n)

    # singletrack with obstacles: the (s, ey) barrier Hessian block
    cfg_o = dict(cfg, obstacles=True)
    fam_o = build_cascaded_family(car, cfg_o, "none", ippodromo_track.data)
    assert fam_o.fast_derivs is not None
    check(fam_o, fam_o._replace(fast_derivs=None), 1)

    # cascaded pm: the fast path covers the (0, N-1) single-track segment
    # (seg-specialized closures); seam/tail segments fall back to generic
    cfg_c = dict(
        _cfg("controllers/cascaded.yaml"), obstacles=True, horizon=4,
        horizon_pm=4,
    )
    fam_c = build_cascaded_family(car, cfg_c, "pm", ippodromo_track.data)
    seg = fam_c.segments[0]
    assert seg.hi == 3  # the st segment
    assert fam_c.fast_derivs(
        jnp.asarray(3), wf, lam, mu, kv, ds_read, seg=fam_c.segments[1]
    ) is None  # seam segment not covered
    check(fam_c, fam_c._replace(fast_derivs=None), 1, seg=seg)

    # pm/kc TAIL segments (seg.lo >= N): the closed-form _tail_fast Hessian
    # must track every tail cost/constraint term — sweep every tail segment
    # of both tail families, obstacles on and off, at each segment edge
    tail_cases = [
        ("pm", "cascaded.yaml", "horizon_pm", False),
        ("pm", "cascaded.yaml", "horizon_pm", True),
        ("kc", "cascaded_kinematic.yaml", "horizon_kc", False),
        ("kc", "cascaded_kinematic.yaml", "horizon_kc", True),
    ]
    for tail_name, ctrl_yaml, hkey, obst in tail_cases:
        cfg_t = dict(
            _cfg(f"controllers/{ctrl_yaml}"), obstacles=obst, horizon=4
        )
        cfg_t[hkey] = 4
        fam_t = build_cascaded_family(
            car, cfg_t, tail_name, ippodromo_track.data
        )
        tails = [s for s in fam_t.segments if s.lo >= 4]
        assert tails, f"{tail_name}: no tail segments built"
        for seg_t in tails:
            for n in sorted({seg_t.lo, seg_t.hi - 1}):
                assert fam_t.fast_derivs(
                    jnp.asarray(n), wf, lam, mu, kv, ds_read, seg=seg_t
                ) is not None, f"{tail_name} seg {seg_t} not on fast path"
                check(
                    fam_t, fam_t._replace(fast_derivs=None), n, seg=seg_t
                )
