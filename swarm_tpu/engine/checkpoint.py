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


# Schema migrations for checkpoints written by older engine layouts
# (advisor r2 finding: the r2 MapState change — total_writes scalar f32 ->
# [2] int32 pair, new merge/v2v leaves — broke old checkpoints with no
# path forward). Keyed by the keypath SUFFIX of the affected leaf:
#   - "zero": leaf added after the checkpoint was written; default-fill
#     with the template's zeros (correct for accumulators starting fresh).
#   - a callable (old_array, template_leaf) -> new_array.
def _migrate_total_writes(old, tmpl):
    """r1 scalar float32 counter -> r2 (hi, lo) int32 pair."""
    if old.shape == np.asarray(tmpl).shape:
        return old
    total = int(old)                      # r1 counter was float32 scalar
    radix = 1 << 30
    return np.asarray([total // radix, total % radix], np.int32)


def _migrate_lm_scan(old, tmpl):
    """lm_scan capacity follows closure_scanmatch ([L, 1] placeholder vs
    [L, R]): crossing configs keeps what fits and zero-fills the rest —
    a scanmatch-off checkpoint stored no scans, and resuming a scanmatch
    run at a different ray count keeps the overlapping prefix."""
    t = np.asarray(tmpl)
    if old.shape == t.shape:
        return old
    out = np.zeros(t.shape, t.dtype)
    r = min(old.shape[1], t.shape[1])
    n = min(old.shape[0], t.shape[0])
    out[:n, :r] = old[:n, :r]
    return out


_MIGRATIONS = {
    ".srv.total_writes": _migrate_total_writes,
    ".srv.merge_dx": "zero",
    ".srv.merge_dy": "zero",
    ".srv.merge_dyaw": "zero",
    ".srv.anchor": "zero",
    ".v2v_total": "zero",
    # r3 scan-matched closure measurements (SlamConfig.closure_scanmatch)
    ".srv.closure.lm_yaw": "zero",
    ".srv.closure.lm_scan": _migrate_lm_scan,
    ".srv.closure.cl_mx": "zero",
    ".srv.closure.cl_my": "zero",
    ".srv.closure.cl_mth": "zero",
    # -1 = "unmeasured edge" sentinel, NOT zero (0.0 would claim a
    # measured edge of fitness 0; both gate out, but the sentinel keeps
    # the log's semantics honest)
    ".srv.closure.cl_fit": "neg_ones",
    # r4 merge-recovery escalation counter (SlamConfig.merge_recover_after)
    ".srv.merge_fail": "zero",
    # r4 online yaw-rate-bias estimator (SlamConfig.merge_bias_alpha).
    # mark=0 on a resumed run means the first observation window spans
    # the whole pre-checkpoint distance — the oversized divisor only
    # SHRINKS the first rate update, so the estimate re-converges safely.
    ".srv.merge_yaw_rate": "zero",
    ".srv.merge_dist_mark": "zero",
    # r4 online frame tracker (SlamConfig.merge_frame_gain,
    # slam/livemerge.py FrameState). px/py = 0 is safe on resume: the
    # tracker's per-step teleport guard skips the one oversized delta
    # and rebases on the next step; a zeroed theta/rate just re-acquires.
    **{f".srv.frame.{f}": "zero"
       for f in ("theta", "scale_dev", "rate", "px", "py", "ax", "ay",
                 "lx", "ly", "qy", "nacc", "dacc", "sacc", "gskip")},
    # r5 proximity-pair rendezvous cooldown (SlamConfig
    # .closure_pair_budget): fresh init is -(1<<30) ("fire immediately")
    ".srv.closure.last_pair_node": "template",
}


def load_pytree(path: str, template, migrate: bool = True):
    """Load into the structure of `template` (shapes/dtypes validated).

    migrate=True applies the known schema shims (_MIGRATIONS) for leaves
    an older checkpoint lacks or stores in a superseded layout; anything
    outside the registry still fails loudly."""
    data = np.load(path)
    keys, vals, treedef = _paths(template)

    def shim_for(k):
        if not migrate:
            return None
        for suffix, m in _MIGRATIONS.items():
            if k.endswith(suffix):
                return m
        return None

    missing = [k for k in keys
               if k not in data.files and shim_for(k) is None]
    if missing:
        raise ValueError(f"checkpoint missing leaves: {missing[:5]}"
                         f"{'...' if len(missing) > 5 else ''}")
    leaves = []
    for k, tmpl in zip(keys, vals):
        t = np.asarray(tmpl)
        shim = shim_for(k)
        if k not in data.files:
            # registered post-checkpoint leaf -> fresh fill ("template"
            # copies the freshly-initialised template leaf — for leaves
            # whose reset value is not 0/-1, e.g. the pair-cooldown's
            # far-negative "fire immediately" sentinel)
            if shim == "template":
                leaves.append(np.array(t, copy=True))
                continue
            fill = -1 if shim == "neg_ones" else 0
            leaves.append(np.full(t.shape, fill, t.dtype))
            continue
        arr = data[k]
        if (arr.shape != t.shape or arr.dtype != t.dtype) and \
                callable(shim):
            arr = shim(arr, tmpl)
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
