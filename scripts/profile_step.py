"""Split the bench step time: whole-solve kernel alone vs full closed-loop
step (init_horizon + kernel + plant + carry glue).  Run on TPU, one process
at a time.  BENCH_CONFIG / BENCH_BATCH as in bench.py."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

import bench as B
from vehicle_control_tpu.parallel import aligned_carry, make_batched_racing_step
from vehicle_control_tpu.solvers import ALILQRConfig


def med_time(fn, args, k=8):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(k):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def main():
    name = os.environ.get("BENCH_CONFIG", "singletrack")
    bs = int(os.environ.get("BENCH_BATCH", 4096))
    dtype = jnp.float32
    problem, temporal, track, solver, s_index, ns = B.build(name, 30, dtype)
    cfg = ALILQRConfig(**solver, use_solve_kernel=True)

    step = jax.jit(
        make_batched_racing_step(problem, cfg, temporal, track.data, 0.05, s_index)
    )
    rng = np.random.default_rng(0)
    avoid = "obstacles" in name or name == "kinematic"
    states = jnp.asarray(B.initial_states(track, ns, bs, rng, avoid), dtype)
    carries = aligned_carry(problem, states, dtype)
    for _ in range(2):
        carries, states, actions, infos = step(carries, states)
    jax.block_until_ready(states)
    t_full = med_time(lambda c, s: step(c, s)[1], (carries, states))

    # kernel alone on the same warm data: build inputs exactly as the solver
    # wrapper does (init_horizon vmapped on host side)
    iv = jax.jit(jax.vmap(problem.init_horizon))
    params, z0 = iv(states, carries.X_pred, carries.U_pred)
    t_horizon = med_time(lambda s, X, U: iv(s, X, U)[1], (states, carries.X_pred, carries.U_pred))

    kern = problem.solve_kernel_factory(cfg)
    run = jax.jit(lambda z0, U, lam, curv, ds: kern(z0, U, lam, curv, ds))
    args = (z0, carries.U_pred, carries.lam, params.curvature, params.ds)
    out = run(*args)
    t_kernel = med_time(run, args)

    print(
        f"{name} B={bs}: full step {t_full:.2f} ms | solve kernel {t_kernel:.2f} ms"
        f" | init_horizon {t_horizon:.2f} ms | glue {t_full - t_kernel - t_horizon:.2f} ms"
    )


if __name__ == "__main__":
    main()
