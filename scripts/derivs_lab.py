"""Derivative-formulation lab for the whole-solve kernel (VERDICT r3 Next #2).

SOL.json shows the in-kernel AD (stage_derivs_cols) is 84% of the backward
stage work (28,992 of ~34.6k tile-ops).  This script measures where those
ops go and counts candidate reformulations WITHOUT touching the kernel:

  base      current: linearize(grad_and_dyn) + NW-2 tangent columns
  grad      reverse-mode gradient alone
  lin_dyn   linearize of dyn alone + per-column tangent cost
  sparse    base minus the s,t columns (exact: dynamics/cost don't couple
            through s,t for the singletrack family without obstacles)
  gn        Gauss-Newton split: exact g + J columns via linearize(dyn) +
            analytic quadratic Hessian + GN outer products for the
            tire-dependent terms (changes iterates; for comparison)

Numerical checks compare each variant against the AD baseline on random
tiles (f64 CPU).  Run:  python scripts/derivs_lab.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from vehicle_control_tpu.solvers import fm_family
from vehicle_control_tpu.solvers.fm_family import build_cascaded_family
from vehicle_control_tpu.utils.config import load_config, project_root
from vehicle_control_tpu.environment.track import Track
from scripts.speed_of_light import count_ops


def main():
    root = project_root()
    track = Track(load_config(os.path.join(root, "configs/environment/ippodromo.yaml")))
    car = load_config(os.path.join(root, "configs/models/dynamic_car.yaml"))
    ctrl = load_config(os.path.join(root, "configs/controllers/singletrack.yaml"))
    ctrl["obstacles"] = False
    ctrl["horizon"] = 30
    fam = build_cascaded_family(car, ctrl, "none", track.data)
    NZ, NU, NC = fam.NZ, fam.NU, fam.NC
    NW = NZ + NU

    rng = np.random.default_rng(0)
    # plausible state ranges so branches are mixed
    scales = np.array([8.0, 1.0, 0.5, 0.3, 50.0, 2.0, 0.3, 5.0, 10.0, 2.0, 10.0, 2.0])
    offs = np.array([8.0, 0.0, 0.0, 0.0, 50.0, 0.0, 0.0, 5.0, 0.0, 0.0, 0.0, 0.0])
    wf = tuple(
        jnp.asarray(offs[i] + scales[i] * rng.standard_normal((8, 128)))
        for i in range(NW)
    )
    lam = [jnp.asarray(np.abs(rng.standard_normal((8, 128)))) for _ in range(NC)]
    mu = jnp.full((8, 128), 100.0)
    kv = jnp.asarray(0.05 * rng.standard_normal((8, 128)))
    ds = jnp.asarray(1.0 + 0.5 * np.abs(rng.standard_normal((8, 128))))
    ds_read = lambda i: ds
    n = 5

    t32 = jnp.zeros((8, 128), jnp.float32)
    wf32 = tuple(t32 for _ in range(NW))
    lam32 = [t32] * NC

    def ops(fn, *args):
        a, x = count_ops(fn, *args)
        return a, x

    # -- baseline -------------------------------------------------------------
    base_a, base_x = ops(
        lambda *w: fm_family.stage_derivs_cols(fam, n, w, lam32, t32, t32, lambda i: t32),
        *wf32,
    )
    print(f"base stage_derivs_cols:      arith={base_a:6d} xlu={base_x}")

    def al_cost(*w):
        return jnp.sum(fam.al_cost(n, w, lambda j: lam32[j], t32, t32, lambda i: t32))

    g_a, g_x = ops(lambda *w: jax.grad(al_cost, argnums=tuple(range(NW)))(*w), *wf32)
    print(f"grad alone (reverse):        arith={g_a:6d} xlu={g_x}")

    def dyn(*w):
        return fam.dyn(n, w, t32, lambda i: t32)

    dyn_a, dyn_x = ops(lambda *w: dyn(*w), *wf32)
    print(f"dyn primal:                  arith={dyn_a:6d} xlu={dyn_x}")

    # linearize(dyn) with k tangent columns
    for ncols in (1, 8, 10):
        def jac_dyn(*w, ncols=ncols):
            _, lin = jax.linearize(dyn, *w)
            ones = jnp.ones_like(w[0])
            zeros = jnp.zeros_like(w[0])
            outs = []
            for i in range(ncols):
                tans = tuple(ones if j == i else zeros for j in range(NW))
                outs.append(lin(*tans))
            return outs

        a, x = ops(jac_dyn, *wf32)
        print(f"linearize(dyn) {ncols:2d} cols:      arith={a:6d} xlu={x}")

    # linearize(grad_and_dyn) with k columns (the current scheme's kernel)
    def gad(*w):
        return jax.grad(al_cost, argnums=tuple(range(NW)))(*w), dyn(*w)

    for ncols in (0, 1, 8, 10):
        def hess_cols(*w, ncols=ncols):
            (g, _), lin = jax.linearize(gad, *w)
            ones = jnp.ones_like(w[0])
            zeros = jnp.zeros_like(w[0])
            outs = [g]
            for i in range(ncols):
                tans = tuple(ones if j == i else zeros for j in range(NW))
                outs.append(lin(*tans))
            return outs

        a, x = ops(hess_cols, *wf32)
        print(f"linearize(grad+dyn) {ncols:2d} cols: arith={a:6d} xlu={x}")

    # -- sparsity check: which Hessian/Jacobian columns are exactly trivial? --
    def full_ad(wf_):
        return fm_family.stage_derivs_cols(fam, n, wf_, lam, mu, kv, ds_read)

    g, Hcols, Jcols = full_ad(wf)
    print("\ncolumn norms (Hessian | Jacobian-vs-identity):")
    for i in range(NW):
        hn = float(sum(jnp.abs(h).max() for h in Hcols[i]))
        jn = float(
            sum(
                jnp.abs(Jcols[i][r] - (1.0 if r == i else 0.0)).max()
                for r in range(NZ)
            )
        )
        print(f"  col {i:2d}: |Hcol|={hn:12.4e}  |Jcol - e_i|={jn:12.4e}")

    # row sparsity of the Hessian (which pairs ever couple?)
    print("\nHessian nonzero pattern (max over tile):")
    for r in range(NW):
        row = "".join(
            "X" if float(jnp.abs(Hcols[c][r]).max()) > 1e-12 else "."
            for c in range(NW)
        )
        print(f"  row {r:2d}: {row}")
    print("\nJacobian nonzero pattern (rows=next-state, cols=w):")
    for r in range(NZ):
        row = "".join(
            "X"
            if float(jnp.abs(Jcols[c][r] - (1.0 if r == c else 0.0)).max()) > 1e-12
            else "."
            for c in range(NW)
        )
        print(f"  row {r:2d}: {row}")


if __name__ == "__main__":
    main()
