"""Cross-agent map merging — the full map_merger.py replacement.

The reference merges per-agent occupancy grids by converting occupied
cells to point clouds, aligning with Open3D ICP, and re-rasterising into a
dynamically-sized global grid (map_merger.py:35-127). Here:

  * alignment = correlative scan matching on the MXU (slam/scanmatch.py),
    batched over agents, with the same fitness-rejection gate;
  * merging = a bilinear affine warp of the whole LOG-ODDS field into the
    global frame followed by an add — evidence from all agents combines
    additively instead of overwriting, and free-space evidence merges too
    (ICP point clouds kept only occupied cells).

`merge_local_maps` is one jittable call: N local grids in, one global
grid + per-agent transforms out.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from swarm_tpu.config import GridConfig, SlamConfig
from swarm_tpu.slam.scanmatch import MatchResult, match_grids


def warp_grid(grid, dx_cells, dy_cells, theta, fill: float = 0.0):
    """Bilinear affine warp about the grid centre: output(p) =
    grid(R(-theta) (p - c - t) + c), i.e. the grid rotated by theta then
    translated by (dx, dy) cells. Pure gather — VPU work."""
    s = grid.shape[0]
    c = (s - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(s, dtype=grid.dtype),
                          jnp.arange(s, dtype=grid.dtype), indexing="ij")
    px = xx - c - dx_cells
    py = yy - c - dy_cells
    ct, st = jnp.cos(-theta), jnp.sin(-theta)
    sx = c + px * ct - py * st
    sy = c + px * st + py * ct
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    fx = sx - x0
    fy = sy - y0

    def at(yi, xi):
        ok = (xi >= 0) & (xi < s) & (yi >= 0) & (yi < s)
        v = grid[jnp.clip(yi, 0, s - 1), jnp.clip(xi, 0, s - 1)]
        return jnp.where(ok, v, fill)

    return (at(y0, x0) * (1 - fx) * (1 - fy) +
            at(y0, x0 + 1) * fx * (1 - fy) +
            at(y0 + 1, x0) * (1 - fx) * fy +
            at(y0 + 1, x0 + 1) * fx * fy)


class MergeResult(NamedTuple):
    global_logodds: jnp.ndarray    # [S, S]
    transforms: MatchResult        # per-agent ([N] leaves)
    merged: jnp.ndarray            # [N] bool — passed the fitness gate


def merge_local_maps(local_logodds, cfg: GridConfig = GridConfig(),
                     slam: SlamConfig = SlamConfig(),
                     fitness_min: float = 0.6,
                     occ_thresh: float = 0.3) -> MergeResult:
    """Align + merge N per-agent log-odds grids.

    Anchor = agent 0's map (the reference anchors the first received map,
    map_merger.py:37-41). Each subsequent map is matched against the
    RUNNING global occupancy and folded in if fitness passes; rejected
    maps are skipped, like ICP rejections (:52-56).
    """
    n = local_logodds.shape[0]
    res = cfg.resolution

    def occ_of(lo):
        return (lo >= occ_thresh).astype(jnp.float32)

    def fold(carry, lo):
        glob = carry
        m = match_grids(occ_of(lo), occ_of(glob), cfg, slam, fitness_min)
        warped = warp_grid(lo, m.dx / res, m.dy / res, m.dtheta)
        glob = jnp.where(m.ok, glob + warped, glob)
        glob = jnp.clip(glob, -cfg.logodds_clamp, cfg.logodds_clamp)
        return glob, (m, m.ok)

    glob0 = local_logodds[0]
    glob, (ms, oks) = jax.lax.scan(fold, glob0, local_logodds[1:])

    # prepend the anchor's identity transform
    def pre(x0, xs):
        return jnp.concatenate([jnp.asarray(x0)[None], xs])

    transforms = MatchResult(
        dx=pre(0.0, ms.dx), dy=pre(0.0, ms.dy), dtheta=pre(0.0, ms.dtheta),
        score=pre(jnp.inf, ms.score), fitness=pre(1.0, ms.fitness),
        ok=pre(True, ms.ok))
    return MergeResult(global_logodds=glob, transforms=transforms,
                       merged=transforms.ok)
