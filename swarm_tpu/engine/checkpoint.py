"""Checkpoint / resume: the whole sim or server state is ONE pytree, so a
checkpoint is a flat npz of its leaves (SURVEY §5: the reference's
'checkpoint' is its CSV session logs + replay; here state snapshots are
exact and resumable mid-run, and the CSV logs remain available via
proto.csvio for reference-tool compatibility).

Keys are JAX keypath strings, so layout changes fail loudly on load rather
than silently misassigning leaves.
"""

from __future__ import annotations

import numpy as np

import jax


def _paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    keys = [jax.tree_util.keystr(path) for path, _ in flat]
    vals = [leaf for _, leaf in flat]
    return keys, vals, treedef


def save_pytree(path: str, tree) -> str:
    """Write any pytree of arrays to one .npz."""
    keys, vals, _ = _paths(tree)
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in
                                 zip(keys, vals)})
    return path


def load_pytree(path: str, template):
    """Load into the structure of `template` (shapes/dtypes validated)."""
    data = np.load(path)
    keys, vals, treedef = _paths(template)
    missing = [k for k in keys if k not in data.files]
    if missing:
        raise ValueError(f"checkpoint missing leaves: {missing[:5]}"
                         f"{'...' if len(missing) > 5 else ''}")
    leaves = []
    for k, tmpl in zip(keys, vals):
        arr = data[k]
        t = np.asarray(tmpl)
        if arr.shape != t.shape:
            raise ValueError(f"leaf {k}: checkpoint shape {arr.shape} != "
                             f"state shape {t.shape}")
        if arr.dtype != t.dtype:
            # Fail loudly: a silent astype() here can lose precision across
            # dtype migrations (e.g. an int32-counter checkpoint loaded into
            # a float32-counter layout).
            raise ValueError(f"leaf {k}: checkpoint dtype {arr.dtype} != "
                             f"state dtype {t.dtype}")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)
