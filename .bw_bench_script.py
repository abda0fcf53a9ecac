import os, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp, numpy as np
from vehicle_control_tpu.utils.config import load_config
from vehicle_control_tpu.environment.track import Track
from vehicle_control_tpu.controllers.mpc import problems
from vehicle_control_tpu.controllers.mpc.controllers import initial_carry
from vehicle_control_tpu.solvers.al_ilqr import _al_penalty, rollout
from vehicle_control_tpu.solvers.riccati import riccati_backward
from vehicle_control_tpu.solvers.backward_kernel_fm import build_backward_kernel_fm

track = Track(load_config("configs/environment/ippodromo.yaml"))
cfg = dict(load_config("configs/controllers/singletrack.yaml"), obstacles=False)
cfg["horizon"] = 30
prob = problems.build_cascaded_problem(load_config("configs/models/dynamic_car.yaml"), track, cfg, "none", jnp.float32)
fns = prob.fns
H, nz, nu, nc = prob.horizon, prob.nz, prob.nu, prob.nc
B = 4096
rng = np.random.default_rng(0)
z0 = np.zeros((B, 8), np.float32); z0[:,0]=5+rng.uniform(0,8,B); z0[:,4]=rng.uniform(0,250,B)
U = (rng.normal(size=(B,H,nu))*0.05).astype(np.float32)
c0 = initial_carry(prob, jnp.float32)
pv, zv = jax.vmap(prob.init_horizon, in_axes=(0,None,None))(jnp.asarray(z0), c0.X_pred, c0.U_pred)
Xb, _ = jax.jit(jax.vmap(lambda p_, z_, u_: rollout(fns, p_, z_, u_)))(pv, zv, jnp.asarray(U))
lam = np.abs(rng.normal(size=(B,H,nc))*0.1).astype(np.float32)
mu = np.full((B,), 10.0, np.float32)
rho = np.full((B,), 1e-4, np.float32)

def stage_derivs(n, z, u, lam_n, m, params):
    w = jnp.concatenate([z, u])
    cost_fn = lambda w_: (fns.stage_cost(n, w_[:nz], w_[nz:], params)
        + _al_penalty(fns.constraints(n, w_[:nz], w_[nz:], params), lam_n, m))
    g = jax.grad(cost_fn)(w)
    Hw = jax.jacfwd(jax.grad(cost_fn))(w)
    Hw = 0.5*(Hw + Hw.T)
    dyn = lambda w_: fns.dynamics(n, w_[:nz], w_[nz:], params)
    J = jax.jacfwd(dyn)(w)
    return g[:nz], g[nz:], Hw[:nz,:nz], Hw[nz:,:nz], Hw[nz:,nz:], J[:,:nz], J[:,nz:]

def ref_backward(X, U, L, m, r, params):
    d = jax.vmap(stage_derivs, in_axes=(0,0,0,0,None,None))(jnp.arange(H), X, U, L, m, params)
    return riccati_backward(*d, r, 4)
ref_fn = jax.jit(jax.vmap(ref_backward, in_axes=(0,0,0,0,0,0)))

run = build_backward_kernel_fm(load_config("configs/models/dynamic_car.yaml"), cfg, H)
kern = jax.jit(lambda *a: run(*a))
args_k = (Xb, jnp.asarray(U), jnp.asarray(lam), jnp.asarray(mu), jnp.asarray(rho), pv.curvature, pv.ds)
args_r = (Xb, jnp.asarray(U), jnp.asarray(lam), jnp.asarray(mu), jnp.asarray(rho), pv)

def bench(f, args, n=20):
    o = f(*args); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(n): o=f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/n*1000, o

t_k, ok = bench(kern, args_k)
print(f"fused backward kernel: {t_k:.2f} ms", flush=True)
t_r, orf = bench(ref_fn, args_r)
print(f"xla derivs+riccati: {t_r:.2f} ms  speedup {t_r/t_k:.2f}x")
for name, a, b in (("kff", ok[0], orf[0]), ("Kfb", ok[1], orf[1]), ("dV1", ok[2], orf[2]), ("dV2", ok[3], orf[3])):
    a = np.asarray(a); b = np.asarray(b)
    both = np.isfinite(a) & np.isfinite(b)
    print(f"{name}: finite a={np.isfinite(a).mean():.4f} b={np.isfinite(b).mean():.4f} max|diff|={np.abs(a-b)[both].max():.3g}")
print("fail agree:", float((np.asarray(ok[4]) == np.asarray(orf[4])).mean()))
