"""Field-major family closures vs the XLA problem closures.

The FM families (solvers.fm_family) are the single source of truth for all
Pallas kernels; these tests pin their AL cost, dynamics and derivative
structure against the batch-polymorphic problem closures for every family
the framework ships — cascaded pm/kc, single-track, kinematic, obstacles on
and off — without going through pallas_call (pure jnp, so they run fast and
by default; the kernels' Mosaic lowering is exercised separately in
test_backward_kernel.py / test_rollout_kernel.py).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vehicle_control_tpu.controllers.mpc import problems
from vehicle_control_tpu.solvers.al_ilqr import _al_penalty
from vehicle_control_tpu.solvers.fm_family import (
    build_cascaded_family,
    build_kinematic_family,
)
from vehicle_control_tpu.utils.config import load_config, project_root

SUB, LANE = 8, 128
B = SUB * LANE


def _cfg(rel):
    return load_config(os.path.join(project_root(), "configs", rel))


def _tiles(a):
    """(B, F) scenario-major -> list of F (8, 128) field tiles."""
    return [jnp.asarray(a[:, i].reshape(SUB, LANE)) for i in range(a.shape[1])]


def _from_tile(t):
    return np.asarray(t).reshape(B)


def _rand_data(prob, rng, speed_slot=0, s_slot=4):
    H, nz, nu, nc = prob.horizon, prob.nz, prob.nu, prob.nc
    Z = rng.normal(size=(B, nz)).astype(np.float32) * 0.5
    Z[:, speed_slot] = 4.0 + rng.uniform(0, 10, B)
    Z[:, s_slot] = rng.uniform(0, 250, B)
    U = (rng.normal(size=(B, nu)) * 0.1).astype(np.float32)
    lam = np.abs(rng.normal(size=(B, nc)) * 0.2).astype(np.float32)
    mu = np.float32(10.0)
    curv = rng.uniform(-0.05, 0.05, B).astype(np.float32)
    ds = np.tile(rng.uniform(0.1, 3.0, (1, H)).astype(np.float32), (B, 1))
    return Z, U, lam, mu, curv, ds


CASES = [
    ("singletrack", "none", False),
    ("singletrack", "none", True),
    ("cascaded", "pm", False),
    ("cascaded", "pm", True),
    ("cascaded_kinematic", "kc", False),
    ("cascaded_kinematic", "kc", True),
]


@pytest.mark.parametrize("name,tail,obstacles", CASES)
def test_cascaded_family_matches_problem(ippodromo_track, name, tail, obstacles):
    cfg = dict(_cfg(f"controllers/{name}.yaml"), obstacles=obstacles)
    cfg["horizon"] = 6
    if tail == "pm":
        cfg["horizon_pm"] = 8
    elif tail == "kc":
        cfg["horizon_kc"] = 8
    car = _cfg("models/dynamic_car.yaml")
    prob = problems.build_cascaded_problem(car, ippodromo_track, cfg, tail, jnp.float32)
    fam = build_cascaded_family(car, cfg, tail, ippodromo_track.data)
    assert fam.H == prob.horizon and fam.NZ == prob.nz and fam.NC == prob.nc

    rng = np.random.default_rng(0)
    Z, U, lam, mu, curv, ds = _rand_data(prob, rng)
    fns = prob.fns

    for n in range(prob.horizon):
        nj = jnp.asarray(n, jnp.int32)
        params = problems.HorizonParams(
            curvature=jnp.broadcast_to(jnp.asarray(curv)[:, None], ds.shape),
            ds=jnp.asarray(ds),
        )
        # XLA reference (batch-polymorphic closures)
        zb, ub = jnp.asarray(Z), jnp.asarray(U)
        ref_cost = fns.stage_cost(nj, zb, ub, params) + _al_penalty_b(
            fns.constraints(nj, zb, ub, params), jnp.asarray(lam), mu
        )
        ref_next = fns.dynamics(nj, zb, ub, params)

        # field-major family
        wf = tuple(_tiles(Z)) + tuple(_tiles(U))
        lam_t = _tiles(lam)
        kv = jnp.asarray(curv.reshape(SUB, LANE))
        mu_t = jnp.full((SUB, LANE), mu)
        ds_read = lambda i: jnp.asarray(ds)[0, i] * jnp.ones((SUB, LANE), jnp.float32)
        fam_cost = fam.al_cost(nj, wf, lambda j: lam_t[j], mu_t, kv, ds_read)
        fam_next = fam.dyn(nj, wf, kv, ds_read)

        np.testing.assert_allclose(
            _from_tile(fam_cost), np.asarray(ref_cost), rtol=2e-4, atol=2e-3,
            err_msg=f"{name} obstacles={obstacles} stage {n} cost",
        )
        for i in range(prob.nz):
            np.testing.assert_allclose(
                _from_tile(fam_next[i]), np.asarray(ref_next[:, i]),
                rtol=2e-4, atol=2e-4,
                err_msg=f"{name} obstacles={obstacles} stage {n} dyn[{i}]",
            )


def _al_penalty_b(c, lam, mu):
    """Batched PHR penalty (the solver's _al_penalty sums over the last axis)."""
    lam_hat = jnp.maximum(0.0, lam + mu * c)
    return (jnp.sum(lam_hat**2, -1) - jnp.sum(lam**2, -1)) / (2.0 * mu)


@pytest.mark.parametrize("obstacles", [False, True])
def test_kinematic_family_matches_problem(ippodromo_track, obstacles):
    cfg = dict(_cfg("controllers/kinematic.yaml"), obstacles=obstacles)
    cfg["horizon"] = 6
    car = _cfg("models/kinematic_car.yaml")
    prob = problems.build_kinematic_problem(car, ippodromo_track, cfg, jnp.float32)
    fam = build_kinematic_family(car, cfg, ippodromo_track.data)
    assert fam.H == prob.horizon and fam.NZ == prob.nz

    rng = np.random.default_rng(1)
    Z, U, lam, mu, curv, ds = _rand_data(prob, rng, speed_slot=0, s_slot=2)
    Z[:, 1] = rng.uniform(-0.3, 0.3, B)  # delta
    fns = prob.fns
    params = problems.HorizonParams(
        curvature=jnp.broadcast_to(jnp.asarray(curv)[:, None], ds.shape),
        ds=jnp.asarray(ds),
    )
    for n in range(prob.horizon):
        nj = jnp.asarray(n, jnp.int32)
        zb, ub = jnp.asarray(Z), jnp.asarray(U)
        ref_cost = fns.stage_cost(nj, zb, ub, params) + _al_penalty_b(
            fns.constraints(nj, zb, ub, params), jnp.asarray(lam), mu
        )
        ref_next = fns.dynamics(nj, zb, ub, params)

        wf = tuple(_tiles(Z)) + tuple(_tiles(U))
        lam_t = _tiles(lam)
        kv = jnp.asarray(curv.reshape(SUB, LANE))
        mu_t = jnp.full((SUB, LANE), mu)
        ds_read = lambda i: jnp.asarray(ds)[0, i] * jnp.ones((SUB, LANE), jnp.float32)
        fam_cost = fam.al_cost(nj, wf, lambda j: lam_t[j], mu_t, kv, ds_read)
        fam_next = fam.dyn(nj, wf, kv, ds_read)

        np.testing.assert_allclose(
            _from_tile(fam_cost), np.asarray(ref_cost), rtol=2e-4, atol=2e-3,
            err_msg=f"kinematic obstacles={obstacles} stage {n} cost",
        )
        for i in range(prob.nz):
            np.testing.assert_allclose(
                _from_tile(fam_next[i]), np.asarray(ref_next[:, i]),
                rtol=2e-4, atol=2e-4,
                err_msg=f"kinematic stage {n} dyn[{i}]",
            )


@pytest.mark.parametrize(
    "name,tail,obstacles",
    [
        ("cascaded", "pm", False),
        ("cascaded", "pm", True),
        ("cascaded_kinematic", "kc", False),
        ("cascaded_kinematic", "kc", True),
    ],
)
def test_segment_specialization_matches_generic(
    ippodromo_track, name, tail, obstacles
):
    """seg-specialized closures == fully-masked generic closures.

    The whole-solve kernel iterates the horizon one static segment at a time
    (FMFamily.segments) so tail stages skip the single-track RK4 entirely;
    this pins every closure's specialized branch to the generic masked body
    at both ends of every segment.
    """
    cfg = dict(_cfg(f"controllers/{name}.yaml"), obstacles=obstacles)
    cfg["horizon"] = 6
    if tail == "pm":
        cfg["horizon_pm"] = 8
    else:
        cfg["horizon_kc"] = 8
    car = _cfg("models/dynamic_car.yaml")
    fam = build_cascaded_family(car, cfg, tail, ippodromo_track.data)
    assert fam.segments is not None
    covered = [i for s in fam.segments for i in range(s.lo, s.hi)]
    assert covered == list(range(fam.H)), fam.segments

    rng = np.random.default_rng(3)
    kv = jnp.asarray(rng.uniform(-0.05, 0.05, (SUB, LANE)).astype(np.float32))
    ds_row = rng.uniform(0.1, 3.0, fam.H).astype(np.float32)
    ds_read = lambda i: jnp.asarray(ds_row)[i] * jnp.ones((SUB, LANE), jnp.float32)
    mu_t = jnp.full((SUB, LANE), 10.0)
    lam_t = _tiles(np.abs(rng.normal(size=(B, fam.NC)) * 0.2).astype(np.float32))

    for seg in fam.segments:
        for n in {seg.lo, seg.hi - 1}:
            nj = jnp.asarray(n, jnp.int32)
            Z = rng.normal(size=(B, fam.NZ)).astype(np.float32) * 0.5
            Z[:, 0] = 4.0 + rng.uniform(0, 10, B)
            Z[:, 4] = rng.uniform(0, 250, B)
            U = (rng.normal(size=(B, fam.NU)) * 0.1).astype(np.float32)
            wf = tuple(_tiles(Z)) + tuple(_tiles(U))

            a0 = fam.al_cost(nj, wf, lambda j: lam_t[j], mu_t, kv, ds_read)
            a1 = fam.al_cost(nj, wf, lambda j: lam_t[j], mu_t, kv, ds_read, seg=seg)
            np.testing.assert_allclose(
                _from_tile(a1), _from_tile(a0), rtol=1e-6, atol=1e-5,
                err_msg=f"{name} obs={obstacles} seg={seg} n={n} al_cost",
            )
            d0 = fam.dyn(nj, wf, kv, ds_read)
            d1 = fam.dyn(nj, wf, kv, ds_read, seg=seg)
            for i in range(fam.NZ):
                np.testing.assert_allclose(
                    _from_tile(d1[i]), _from_tile(d0[i]), rtol=1e-6, atol=1e-6,
                    err_msg=f"{name} obs={obstacles} seg={seg} n={n} dyn[{i}]",
                )
            c0 = fam.constraints(nj, wf)
            c1 = fam.constraints(nj, wf, seg=seg)
            for j in range(fam.NC):
                np.testing.assert_allclose(
                    _from_tile(c1[j]), _from_tile(c0[j]), rtol=1e-6, atol=1e-6,
                    err_msg=f"{name} obs={obstacles} seg={seg} n={n} con[{j}]",
                )
            s0 = fam.stage_cost(nj, wf, kv, ds_read)
            s1 = fam.stage_cost(nj, wf, kv, ds_read, seg=seg)
            np.testing.assert_allclose(
                _from_tile(s1), _from_tile(s0), rtol=1e-6, atol=1e-5,
                err_msg=f"{name} obs={obstacles} seg={seg} n={n} stage_cost",
            )
            for j in range(fam.NU):
                b0 = fam.u_box(nj, j)
                b1 = fam.u_box(nj, j, seg=seg)
                for x, y in zip(b0, b1):
                    xv = np.asarray(jnp.broadcast_to(jnp.asarray(x, jnp.float32), (SUB, LANE)))
                    yv = np.asarray(jnp.broadcast_to(jnp.asarray(y, jnp.float32), (SUB, LANE)))
                    np.testing.assert_allclose(
                        yv, xv, err_msg=f"{name} seg={seg} n={n} u_box[{j}]",
                    )


@pytest.mark.parametrize("name,tail,obstacles", [("cascaded", "pm", True)])
def test_family_gradients_match(ippodromo_track, name, tail, obstacles):
    """Spot-check in-kernel-style AD (grad + jvp columns) vs jacfwd(grad)."""
    cfg = dict(_cfg(f"controllers/{name}.yaml"), obstacles=obstacles)
    cfg["horizon"] = 4
    cfg["horizon_pm"] = 4
    car = _cfg("models/dynamic_car.yaml")
    prob = problems.build_cascaded_problem(car, ippodromo_track, cfg, tail, jnp.float32)
    fam = build_cascaded_family(car, cfg, tail, ippodromo_track.data)
    fns = prob.fns
    NZ, NU = fam.NZ, fam.NU
    NW = NZ + NU

    rng = np.random.default_rng(2)
    Z, U, lam, mu, curv, ds = _rand_data(prob, rng)
    params = problems.HorizonParams(
        curvature=jnp.broadcast_to(jnp.asarray(curv)[:, None], ds.shape),
        ds=jnp.asarray(ds),
    )
    for n in (1, 3, 4, 7):  # st, seam-1, switch, tail
        nj = jnp.asarray(n, jnp.int32)

        def ref_g(z, u, lam_n, pp):
            w = jnp.concatenate([z, u])
            cost = lambda ww: (
                fns.stage_cost(nj, ww[:NZ], ww[NZ:], pp)
                + _al_penalty(fns.constraints(nj, ww[:NZ], ww[NZ:], pp), lam_n, mu)
            )
            return jax.grad(cost)(w)

        gref = jax.vmap(ref_g)(jnp.asarray(Z), jnp.asarray(U), jnp.asarray(lam), params)

        wf = tuple(_tiles(Z)) + tuple(_tiles(U))
        lam_t = _tiles(lam)
        kv = jnp.asarray(curv.reshape(SUB, LANE))
        mu_t = jnp.full((SUB, LANE), mu)
        ds_read = lambda i: jnp.asarray(ds)[0, i] * jnp.ones((SUB, LANE), jnp.float32)

        def al_sum(*w):
            return jnp.sum(fam.al_cost(nj, w, lambda j: lam_t[j], mu_t, kv, ds_read))

        g = jax.grad(al_sum, argnums=tuple(range(NW)))(*wf)
        for i in range(NW):
            np.testing.assert_allclose(
                _from_tile(g[i]), np.asarray(gref[:, i]), rtol=3e-3, atol=3e-3,
                err_msg=f"stage {n} grad[{i}]",
            )
