"""Offline rendering: track maps, race replays, GIFs.

The reference renders *inside* the simulation loop (matplotlib FuncAnimation
drives the physics, racing.py:208-215) — plotting wall-time gates the
controller.  Here rendering is a pure post-processing step over the saved
arrays: the sim loop is headless jitted XLA, and any run directory (ours or
the reference's — same .npy layout) can be replayed.

Plot content mirrors the reference: track boundaries + centerline
(track.py:342-361), car body + wheels (racing_car.py:54-129), MPC prediction
dots (racing.py:300-320), and the live side plots (speed, steer, force,
steer rate; racing.py:322-414).
"""

from __future__ import annotations

import os

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib.animation import FuncAnimation, PillowWriter
from matplotlib.patches import Circle as CirclePatch
from matplotlib.transforms import Affine2D


def plot_track(track, ax=None):
    """Track centerline + lane boundaries + obstacles (reference: track.py:342-361)."""
    if ax is None:
        _, ax = plt.subplots(figsize=(9, 6))
    xs = np.array([wp.x for wp in track.waypoints])
    ys = np.array([wp.y for wp in track.waypoints])
    lbs = np.array([wp.lb for wp in track.waypoints])
    rbs = np.array([wp.rb for wp in track.waypoints])
    ax.plot(xs, ys, "--", color="0.6", lw=0.8)
    ax.plot(lbs[:, 0], lbs[:, 1], color="k", lw=1.2)
    ax.plot(rbs[:, 0], rbs[:, 1], color="k", lw=1.2)
    for obs in track.obstacles:
        ax.add_patch(CirclePatch((obs.cx, obs.cy), obs.radius, color="crimson", alpha=0.5))
    ax.set_aspect("equal")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    return ax


def _draw_car(ax, x, y, psi, delta, length=2.5, width=1.2, color="#007CFF"):
    """Car body rectangle + wheels (reference: racing_car.py:54-129)."""
    from matplotlib.patches import Rectangle

    body = Rectangle(
        (-length / 2, -width / 2), length, width, color=color, alpha=0.7, zorder=5
    )
    tr = Affine2D().rotate(psi).translate(x, y) + ax.transData
    body.set_transform(tr)
    ax.add_patch(body)
    # front wheels show steering
    for side in (-1, 1):
        wheel = Rectangle((-0.25, -0.08), 0.5, 0.16, color="k", zorder=6)
        wtr = (
            Affine2D()
            .rotate(delta)
            .translate(length / 3, side * width / 2.6)
            .rotate(psi)
            .translate(x, y)
            + ax.transData
        )
        wheel.set_transform(wtr)
        ax.add_patch(wheel)
    return body


def render_racing_frame(sim, name, step, ax=None):
    """Single replay frame: track + car + prediction dots."""
    from vehicle_control_tpu.environment import track as track_mod

    ax = plot_track(sim.track, ax=ax)
    st = sim.state_traj[name][step]
    s_i, ey_i = sim.s_index, sim.ey_index
    epsi_i = {4: 6, 2: 4}[s_i]  # dynamic: epsi at 6; kinematic: at 4
    x, y, psi = track_mod.rel2glob(
        sim.track.data, st[s_i], st[ey_i], st[epsi_i]
    )
    delta = st[3] if s_i == 4 else st[1]
    _draw_car(ax, float(x), float(y), float(psi), float(delta))
    if hasattr(sim, "pred_traj") and name in getattr(sim, "pred_traj", {}):
        preds = sim._global_preds(name)[step]
        ax.plot(preds[:, 0], preds[:, 1], ".", ms=3, color="#E16917", zorder=7)
    return ax


def render_racing_gif(sim, path=None, stride=4, fps=20, max_frames=250):
    """Replay a finished run to a GIF (reference: simulator.py:48-63)."""
    os.makedirs(os.path.join(sim.src_dir), exist_ok=True)
    outputs = []
    for name in sim.state_traj:
        T = len(sim.state_traj[name])
        frames = list(range(0, T, stride))[:max_frames]
        fig, ax = plt.subplots(figsize=(9, 6))

        def update(i):
            ax.clear()
            render_racing_frame(sim, name, frames[i], ax=ax)
            ax.set_title(f"{name} — step {frames[i]}")

        anim = FuncAnimation(fig, update, frames=len(frames))
        out = path or os.path.join(sim.src_dir, f"{name}_replay.gif")
        anim.save(out, writer=PillowWriter(fps=fps))
        plt.close(fig)
        outputs.append(out)
    return outputs


def render_combined_gif(
    sim, path=None, stride=4, fps=20, max_frames=300, colors=None
):
    """All controllers racing on one track simultaneously — the reference's
    signature ghost-car animation (racing.py:108-215, 230-241).  Cars advance
    in lock-step simulation time (dt is shared); a car that finishes its lap
    freezes at its final state while the others continue."""
    from vehicle_control_tpu.environment import track as track_mod

    names = list(sim.state_traj)
    palette = colors or ["#007CFF", "#E16917", "#9932CC", "#2E8B57"]
    T = max(len(sim.state_traj[n]) for n in names)
    frames = list(range(0, T, stride))[:max_frames]
    fig, ax = plt.subplots(figsize=(9, 6))

    def update(i):
        ax.clear()
        plot_track(sim.track, ax=ax)
        step = frames[i]
        for ci, name in enumerate(names):
            st_all = sim.state_traj[name]
            st = st_all[min(step, len(st_all) - 1)]
            s_i, ey_i = sim.s_index, sim.ey_index
            epsi_i = {4: 6, 2: 4}[s_i]
            x, y, psi = track_mod.rel2glob(
                sim.track.data, st[s_i], st[ey_i], st[epsi_i]
            )
            delta = st[3] if s_i == 4 else st[1]
            color = palette[ci % len(palette)]
            _draw_car(ax, float(x), float(y), float(psi), float(delta), color=color)
            ax.plot([], [], color=color, lw=3, label=name)
        ax.legend(loc="upper right")
        ax.set_title(f"t = {frames[i] * sim.dt:.2f} s")

    anim = FuncAnimation(fig, update, frames=len(frames))
    out = path or os.path.join(sim.src_dir, "race_replay.gif")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    anim.save(out, writer=PillowWriter(fps=fps))
    plt.close(fig)
    return out


def plot_race_summary(sim, name, path=None):
    """Static summary figure: trajectory + speed/steer/force traces
    (the reference's live side plots, racing.py:322-414, post-hoc)."""
    st = sim.state_traj[name]
    ac = sim.action_traj[name]
    fig = plt.figure(figsize=(14, 8))
    ax0 = fig.add_subplot(2, 2, (1, 3))
    render_racing_frame(sim, name, len(st) - 1, ax=ax0)
    from vehicle_control_tpu.environment import track as track_mod

    s_i, ey_i = sim.s_index, sim.ey_index
    epsi_i = {4: 6, 2: 4}[s_i]
    xs, ys, _ = track_mod.rel2glob(
        sim.track.data, st[:, s_i], st[:, ey_i], st[:, epsi_i]
    )
    ax0.plot(np.asarray(xs), np.asarray(ys), color="#007CFF", lw=1.5)
    t = st[:, sim.t_index]
    ax1 = fig.add_subplot(2, 2, 2)
    ax1.plot(t, st[:, sim.speed_index])
    ax1.set_ylabel("speed [m/s]")
    ax2 = fig.add_subplot(2, 2, 4)
    ax2.plot(t, ac[:, 0], label="u0")
    ax2b = ax2.twinx()
    ax2b.plot(t, ac[:, 1], color="#E16917", label="u1")
    ax2.set_xlabel("t [s]")
    ax2.set_ylabel("u0")
    ax2b.set_ylabel("u1")
    out = path or os.path.join(sim.src_dir, f"{name}_summary.png")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    fig.savefig(out, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return out


def render_tracking_gif(run, path="experiments/videos/tracking.gif", fps=20, stride=2):
    """Animate a trajectory-tracking run: robot (circle + heading), reference
    point, error trace (reference: trajectory_tracking.py:63-177)."""
    import numpy as np

    states = np.asarray(run.states)
    p_ref = np.asarray(run.p_ref)
    e_p = np.asarray(run.e_p)
    frames = list(range(0, len(states), stride))
    fig, (ax, ax_e) = plt.subplots(
        1, 2, figsize=(11, 5), gridspec_kw={"width_ratios": [3, 2]}
    )

    def update(i):
        f = frames[i]
        ax.clear()
        ax.plot(p_ref[: f + 1, 0], p_ref[: f + 1, 1], "--", color="0.6")
        ax.plot(states[: f + 1, 0], states[: f + 1, 1], color="#007CFF", lw=1.5)
        x, y, psi = states[f, 0], states[f, 1], states[f, 2]
        ax.add_patch(CirclePatch((x, y), 0.08, color="#007CFF"))
        ax.plot(
            [x, x + 0.2 * np.cos(psi)], [y, y + 0.2 * np.sin(psi)], color="k", lw=2
        )
        ax.plot(*p_ref[f], "o", ms=6, color="#E16917")
        ax.set_aspect("equal")
        ax.set_title(f"t = {states[f, 3]:.2f} s")
        ax_e.clear()
        ax_e.plot(states[: f + 1, 3], np.linalg.norm(e_p[: f + 1], axis=-1))
        ax_e.set_xlabel("t [s]")
        ax_e.set_ylabel("|e_p| [m]")

    anim = FuncAnimation(fig, update, frames=len(frames))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    anim.save(path, writer=PillowWriter(fps=fps))
    plt.close(fig)
    return path


class RunReplay:
    """Lightweight replay handle over a saved run directory — ours or the
    reference's (same .npy layout, racing.py:441-459) — without building
    controllers or solvers.  Duck-types the slice of the simulator API the
    render functions read (track / state_traj / action_traj / indices / dt).
    """

    def __init__(self, run_dir, track=None, dt=0.05):
        import glob

        from vehicle_control_tpu.environment.track import Track
        from vehicle_control_tpu.utils.config import load_config, project_root

        self.src_dir = run_dir
        self.dt = dt
        names = sorted(
            os.path.basename(p)[: -len("_state_traj.npy")]
            for p in glob.glob(os.path.join(run_dir, "*_state_traj.npy"))
        )
        if not names:
            raise FileNotFoundError(f"no *_state_traj.npy under {run_dir}")
        self.state_traj, self.action_traj, self.pred_traj = {}, {}, {}
        for n in names:
            self.state_traj[n] = np.load(
                os.path.join(run_dir, f"{n}_state_traj.npy")
            )
            apath = os.path.join(run_dir, f"{n}_action_traj.npy")
            if os.path.exists(apath):
                self.action_traj[n] = np.load(apath)
        ns = next(iter(self.state_traj.values())).shape[1]
        if ns >= 8:  # dynamic bicycle (Ux, Uy, r, delta, s, ey, epsi, t)
            self.s_index, self.ey_index = 4, 5
            self.t_index, self.speed_index = 7, 0
        else:  # kinematic (v, delta, s, ey, epsi, t)
            self.s_index, self.ey_index = 2, 3
            self.t_index, self.speed_index = 5, 0
        if track is None:
            # run dirs are named <run>_<track> (racing.py's layout)
            tname = os.path.basename(os.path.normpath(run_dir)).rsplit("_", 1)[-1]
            cfg = os.path.join(
                project_root(), "configs", "environment", f"{tname}.yaml"
            )
            if not os.path.exists(cfg):
                raise FileNotFoundError(
                    f"cannot infer track from '{run_dir}' (no {cfg}); "
                    "pass track= explicitly"
                )
            track = Track(load_config(cfg))
        self.track = track


def live_replay(run_dir, stride=2, interval_ms=50, out=None):
    """Incremental replay of a finished run — the reference's interactive
    live view (simulator.py:34-46, racing.py:208-215) WITHOUT re-coupling
    plotting to the solve loop: physics ran headless, this just plays the
    saved lap back frame by frame with the growing speed/steer side traces.

    Opens an interactive window when a GUI backend is available; otherwise
    (headless) falls back to writing a GIF at ``out`` (default
    ``<run_dir>/live_replay.gif``).
    """
    sim = RunReplay(run_dir) if isinstance(run_dir, str) else run_dir
    names = list(sim.state_traj)
    interactive = False
    try:  # switch to a GUI backend if one exists
        plt.switch_backend("TkAgg")
        interactive = True
    except Exception:
        plt.switch_backend("Agg")

    name = names[0]
    st = sim.state_traj[name]
    ac = sim.action_traj.get(name)
    T = len(st)
    frames = list(range(0, T, stride))
    fig = plt.figure(figsize=(13, 6))
    ax = fig.add_subplot(1, 2, 1)
    ax_v = fig.add_subplot(2, 2, 2)
    ax_u = fig.add_subplot(2, 2, 4)
    t_all = st[:, sim.t_index]

    def update(i):
        f = frames[i]
        ax.clear()
        render_racing_frame(sim, name, f, ax=ax)
        ax.set_title(f"{name} — t = {t_all[f]:.2f} s")
        ax_v.clear()
        ax_v.plot(t_all[: f + 1], st[: f + 1, sim.speed_index], color="#007CFF")
        ax_v.set_xlim(0, t_all[-1])
        ax_v.set_ylim(0, float(st[:, sim.speed_index].max()) * 1.1 + 1e-9)
        ax_v.set_ylabel("speed [m/s]")
        if ac is not None:
            ax_u.clear()
            k = min(f + 1, len(ac))
            ax_u.plot(t_all[:k], ac[:k, 0], color="#E16917")
            ax_u.set_xlim(0, t_all[-1])
            ax_u.set_ylabel("u0")
            ax_u.set_xlabel("t [s]")

    anim = FuncAnimation(fig, update, frames=len(frames), interval=interval_ms)
    if interactive:
        plt.show()
        return None
    out = out or os.path.join(sim.src_dir, "live_replay.gif")
    anim.save(out, writer=PillowWriter(fps=max(1, 1000 // interval_ms)))
    plt.close(fig)
    return out


def _main():  # pragma: no cover - exercised via CLI
    import argparse

    ap = argparse.ArgumentParser(description="offline run rendering")
    ap.add_argument("run_dir", help="run directory (ours or the reference's)")
    ap.add_argument("--live", action="store_true", help="incremental replay")
    ap.add_argument("--stride", type=int, default=2)
    ap.add_argument("--interval-ms", type=int, default=50)
    ap.add_argument("--out", default=None, help="GIF path (headless fallback)")
    args = ap.parse_args()
    if args.live:
        out = live_replay(
            args.run_dir, stride=args.stride, interval_ms=args.interval_ms,
            out=args.out,
        )
        if out:
            print(f"no GUI backend; wrote {out}")
    else:
        sim = RunReplay(args.run_dir)
        print(render_racing_gif(sim, path=args.out))


def plot_slip_angles(sim, name, path=None):
    """Slip-angle diagnostics figure: alpha vs alphamod front/rear over the
    lap (the reference's slip_angle_plot live mode, racing.py:108-215)."""
    from vehicle_control_tpu.models import dynamic_car as dc
    import jax.numpy as jnp

    st = sim.state_traj[name]
    ac = sim.action_traj[name]
    p = dc.DynamicCarParams.from_config(sim.car_config)
    d = dc.diagnostics(jnp.asarray(st), jnp.asarray(ac), p)
    t = st[:, sim.t_index]
    fig, axes = plt.subplots(2, 1, figsize=(10, 6), sharex=True)
    for ax, side in zip(axes, ("f", "r")):
        ax.plot(t, np.rad2deg(np.asarray(d[f"alpha_{side}"])), label=rf"$\alpha_{side}$")
        am = np.rad2deg(np.asarray(d[f"alphamod_{side}"]))
        ax.plot(t, am, "--", color="crimson", label=rf"$\alpha_{{mod,{side}}}$")
        ax.plot(t, -am, "--", color="crimson")
        ax.set_ylabel("deg")
        ax.legend(loc="upper right")
    axes[1].set_xlabel("t [s]")
    out = path or os.path.join(sim.src_dir, f"{name}_slip_angles.png")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    fig.savefig(out, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return out


if __name__ == "__main__":  # pragma: no cover
    _main()
