"""Solver-state checkpointing (SURVEY §5 "Checkpoint / resume": greenfield —
the reference has no training-checkpoint concept). Saves any pytree of arrays
(BAState, SolveResult, params) to a single .npz with structure metadata, so a
long optimization can resume mid-run (params, lambda, iteration counter all
round-trip)."""

import json

import jax
import jax.numpy as jnp
import numpy as np


def save_pytree(path, tree):
    """Serialize a pytree of arrays/scalars to `path` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8)
    np.savez(path, **arrays)
    return path


def load_pytree(path, like):
    """Load arrays saved by `save_pytree`, restoring the structure of `like`
    (the target pytree provides treedef and dtypes)."""
    data = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    leaves = []
    for i, ref in enumerate(leaves_like):
        arr = data[f"leaf_{i}"]
        leaves.append(jnp.asarray(arr, dtype=getattr(ref, "dtype", None)))
    return jax.tree_util.tree_unflatten(treedef, leaves)
