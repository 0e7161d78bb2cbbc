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
    (the target pytree provides treedef and dtypes).

    The stored treedef string and leaf count are validated against `like`;
    loading into a mismatched structure raises instead of silently
    mis-assigning leaves (VERDICT r1 item 9)."""
    data = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    stored_def = json.loads(bytes(data["__treedef__"]).decode())
    if stored_def != str(treedef):
        raise ValueError(
            "checkpoint structure mismatch:\n"
            f"  stored: {stored_def}\n  target: {treedef}")
    n_stored = sum(1 for k in data.files if k.startswith("leaf_"))
    if n_stored != len(leaves_like):
        raise ValueError(f"checkpoint has {n_stored} leaves, "
                         f"target expects {len(leaves_like)}")
    leaves = []
    for i, ref in enumerate(leaves_like):
        arr = data[f"leaf_{i}"]
        ref_shape = getattr(ref, "shape", None)
        if ref_shape is not None and tuple(arr.shape) != tuple(ref_shape):
            raise ValueError(f"checkpoint leaf {i} shape {arr.shape} != "
                             f"target {ref_shape}")
        leaves.append(jnp.asarray(arr, dtype=getattr(ref, "dtype", None)))
    return jax.tree_util.tree_unflatten(treedef, leaves)
