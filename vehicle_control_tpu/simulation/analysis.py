"""Run analysis: golden-run parity metrics and summary statistics.

The reference's de-facto verification is golden closed-loop artifacts +
summary metrics (SURVEY §4).  This module makes those comparisons
first-class: load any reference run directory (same .npy layout) and measure
how closely a controller reproduces its action sequence.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np
import yaml

from vehicle_control_tpu.utils.config import ConfigDict


class ReferenceRun(NamedTuple):
    states: np.ndarray  # (T, ns)
    actions: np.ndarray  # (T, na)
    elapsed: np.ndarray  # (T-1,) or (T,)
    config: ConfigDict
    preds: np.ndarray | None


def load_reference_run(run_dir: str, controller: str) -> ReferenceRun:
    """Load a reference experiments/data run (racing.py:441-459 layout)."""
    states = np.load(os.path.join(run_dir, f"{controller}_state_traj.npy"))
    actions = np.load(os.path.join(run_dir, f"{controller}_action_traj.npy"))
    elapsed = np.load(os.path.join(run_dir, f"{controller}_elapsed.npy"))
    with open(os.path.join(run_dir, f"{controller}_config.yaml")) as fh:
        config = ConfigDict(yaml.safe_load(fh))
    preds_path = os.path.join(run_dir, f"{controller}_preds.npy")
    preds = np.load(preds_path) if os.path.exists(preds_path) else None
    return ReferenceRun(states, actions, elapsed, config, preds)


class ParityReport(NamedTuple):
    n_steps: int
    rms_dev: np.ndarray  # (na,) RMS action deviation
    rms_ref: np.ndarray  # (na,) RMS reference action magnitude
    median_abs_dev: np.ndarray  # (na,)
    correlation: np.ndarray  # (na,)
    p99_abs_dev: np.ndarray | None = None  # (na,)
    max_abs_dev: np.ndarray | None = None  # (na,)

    @property
    def median_normalized_dev(self):
        """The north-star metric (BASELINE.json): per-channel control
        deviation normalized by the reference signal's RMS magnitude —
        the '<=1e-3 control-sequence deviation over a full lap' scale."""
        return self.median_abs_dev / np.maximum(self.rms_ref, 1e-12)

    @property
    def rms_normalized_dev(self):
        return self.rms_dev / np.maximum(self.rms_ref, 1e-12)

    @property
    def p99_normalized_dev(self):
        if self.p99_abs_dev is None:
            raise ValueError("ParityReport built without p99_abs_dev")
        return self.p99_abs_dev / np.maximum(self.rms_ref, 1e-12)

    @property
    def max_normalized_dev(self):
        if self.max_abs_dev is None:
            raise ValueError("ParityReport built without max_abs_dev")
        return self.max_abs_dev / np.maximum(self.rms_ref, 1e-12)

    def __str__(self):  # pragma: no cover
        lines = [f"parity over {self.n_steps} steps:"]
        for i in range(len(self.rms_dev)):
            lines.append(
                f"  u[{i}]: median|dev| {self.median_abs_dev[i]:.4g} "
                f"(normalized {self.median_normalized_dev[i]:.2e}), "
                f"RMS dev {self.rms_dev[i]:.4g} (signal {self.rms_ref[i]:.4g}), "
                f"corr {self.correlation[i]:.4f}"
            )
        return "\n".join(lines)


def action_parity(
    controller_step, initial_carry, ref: ReferenceRun, n_steps: int | None = None,
    action_shift: int = 1,
) -> ParityReport:
    """Feed the reference's recorded states into our controller and compare
    action sequences.

    ``action_shift=1`` aligns logs: the reference records the zero initial
    action at index 0 and the action applied at step i at index i+1
    (racing.py:236-241).
    """
    import jax.numpy as jnp

    T = len(ref.states) if n_steps is None else min(n_steps, len(ref.states))
    carry = initial_carry
    ours = []
    for i in range(T):
        carry, act, _ = controller_step(carry, jnp.asarray(ref.states[i]))
        ours.append(np.asarray(act))
    ours = np.asarray(ours)
    theirs = ref.actions[action_shift : action_shift + T]
    n = min(len(ours), len(theirs))
    ours, theirs = ours[:n], theirs[:n]
    dev = ours - theirs
    return ParityReport(
        n_steps=n,
        rms_dev=np.sqrt((dev**2).mean(axis=0)),
        rms_ref=np.sqrt((theirs**2).mean(axis=0)),
        median_abs_dev=np.median(np.abs(dev), axis=0),
        correlation=np.array(
            [np.corrcoef(ours[:, i], theirs[:, i])[0, 1] for i in range(ours.shape[1])]
        ),
        p99_abs_dev=np.percentile(np.abs(dev), 99, axis=0),
        max_abs_dev=np.abs(dev).max(axis=0),
    )


def summarize_run(states, actions, elapsed, dt, t_index, speed_index, ey_index):
    """The reference's summarize() metrics (racing.py:92-106) as a dict."""
    return {
        "laptime": float(states[-1, t_index] + dt),
        "mean_step_ms": float(np.mean(elapsed) * 1e3),
        "median_step_ms": float(np.median(elapsed) * 1e3),
        "avg_speed": float(np.mean(states[:, speed_index])),
        "mean_abs_u0": float(np.mean(np.abs(actions[:, 0]))),
        "mse_ey": float(np.mean(states[:, ey_index] ** 2)),
    }
