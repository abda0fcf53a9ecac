"""Native-layer verification triangle (SURVEY §4 'solver' layer):

   JAX Riccati  ==  C++ Riccati  ==  C++ full-KKT LDL^T Newton step

Three independent implementations of the same structured linear solve — the
role MA27 plays in the reference — must agree on random problems.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vehicle_control_tpu.solvers.riccati import riccati_backward as jax_riccati

native = pytest.importorskip("vehicle_control_tpu.native")


def _random_problem(H=12, nx=6, nu=2, seed=0):
    rng = np.random.default_rng(seed)
    A = np.eye(nx) + 0.1 * rng.normal(size=(H, nx, nx))
    B = 0.3 * rng.normal(size=(H, nx, nu))
    lz = rng.normal(size=(H, nx))
    lu = rng.normal(size=(H, nu))
    lzz = np.zeros((H, nx, nx))
    luu = np.zeros((H, nu, nu))
    luz = 0.05 * rng.normal(size=(H, nu, nx))
    for n in range(H):
        Q = rng.normal(size=(nx, nx))
        lzz[n] = Q @ Q.T / nx + np.eye(nx)
        R = rng.normal(size=(nu, nu))
        luu[n] = R @ R.T / nu + np.eye(nu)
    return lz, lu, lzz, luz, luu, A, B


class TestNativeRiccati:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_jax(self, seed):
        lz, lu, lzz, luz, luu, A, B = _random_problem(seed=seed)
        rho = 1e-8
        kff_c, Kfb_c, dV1_c, dV2_c, fail_c = native.riccati_backward(
            lz, lu, lzz, luz, luu, A, B, rho
        )
        kff_j, Kfb_j, dV1_j, dV2_j, fail_j = jax_riccati(
            *map(jnp.asarray, (lz, lu, lzz, luz, luu, A, B)), rho
        )
        assert not fail_c and not bool(fail_j)
        np.testing.assert_allclose(kff_c, np.asarray(kff_j), rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(Kfb_c, np.asarray(Kfb_j), rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(dV1_c, float(dV1_j), rtol=1e-9)
        np.testing.assert_allclose(dV2_c, float(dV2_j), rtol=1e-9)

    def test_detects_indefinite(self):
        lz, lu, lzz, luz, luu, A, B = _random_problem(seed=3)
        # last stage: Vxx = 0 there, so Quu = luu exactly -> indefinite
        luu[-1] = -np.eye(2)
        _, _, _, _, fail = native.riccati_backward(
            lz, lu, lzz, luz, luu, A, B, 0.0
        )
        assert fail


class TestKKTOracle:
    @pytest.mark.parametrize("seed", [0, 4])
    def test_riccati_equals_full_kkt(self, seed):
        """The Riccati open-loop step (dx_0=0, du = kff + K dx propagated)
        must equal the Newton step from the full KKT factorization."""
        lz, lu, lzz, luz, luu, A, B = _random_problem(H=10, seed=seed)
        kff, Kfb, _, _, fail = native.riccati_backward(
            lz, lu, lzz, luz, luu, A, B, 0.0
        )
        assert not fail
        H, nx = lz.shape
        nu = lu.shape[-1]
        du_riccati = np.zeros((H, nu))
        dx = np.zeros(nx)
        for n in range(H):
            du_riccati[n] = kff[n] + Kfb[n] @ dx
            if n + 1 < H:
                dx = A[n] @ dx + B[n] @ du_riccati[n]
        du_kkt = native.kkt_newton_step(lz, lu, lzz, luz, luu, A, B)
        np.testing.assert_allclose(du_riccati, du_kkt, rtol=1e-7, atol=1e-8)
