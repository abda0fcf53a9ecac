"""Mid-run checkpoint/resume for long scenario sweeps.

The reference persists only *finished* runs (racing.py:441-450).  Large
batched sweeps (10^4-10^5 scenarios x many laps) need mid-run durability:
the sweep state is just a pytree (MPC carries + plant states + step count),
so checkpointing is a flat .npz of its leaves.  Host-side, cheap, and
restores bit-exactly on any topology with the same per-host shard shapes.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save_sweep_checkpoint(path: str, step: int, carries, states, extra=None):
    """Write sweep state to ``path`` (.npz).  ``carries``/``states`` may be
    any pytree of arrays; sharded jax.Arrays are gathered per-host."""
    leaves, treedef = jax.tree.flatten((carries, states, extra))
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, step=step, treedef=str(treedef), **arrays)
    os.replace(tmp, path)
    return path


def load_sweep_checkpoint(path: str, like_carries, like_states, like_extra=None):
    """Restore (step, carries, states, extra) using example pytrees for
    structure (their treedef must match what was saved)."""
    data = np.load(path, allow_pickle=False)
    _, treedef = jax.tree.flatten((like_carries, like_states, like_extra))
    n = len([k for k in data.files if k.startswith("leaf_")])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    carries, states, extra = jax.tree.unflatten(treedef, leaves)
    return int(data["step"]), carries, states, extra
