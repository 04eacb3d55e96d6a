"""Coarse frontier targets + grouped ray casting."""

import jax.numpy as jnp
import numpy as np

from swarm_tpu.config import CoordConfig, GridConfig
from swarm_tpu.geom.world import (BEDROOM_WALLS, cast_rays,
                                  cast_rays_grouped, make_multi_room,
                                  walls_by_group)
from swarm_tpu.ops.frontier import frontier_clusters, frontier_targets_coarse


def test_coarse_targets_near_exact_clusters():
    cfg = GridConfig(size=512)
    coord = CoordConfig(max_frontiers=16)
    grid = np.full((512, 512), -1, np.int8)
    # two free blobs bordered by unknown -> two frontier clusters
    grid[100:140, 100:140] = 0
    grid[300:330, 320:360] = 0
    g = jnp.asarray(grid)
    from swarm_tpu.ops.frontier import frontier_mask
    c_exact, _, n_exact = frontier_clusters(g, cfg, coord)
    c_coarse, sizes, n_coarse = frontier_targets_coarse(g, cfg, coord)
    assert int(n_exact) >= 2 and int(n_coarse) >= 2
    # every coarse target sits ON the frontier (within half a block of a
    # frontier cell), and both blobs are represented
    mask = np.asarray(frontier_mask(g, cfg))
    fy, fx = np.nonzero(mask)
    fw = np.stack([cfg.origin_x + (fx + 0.5) * cfg.resolution,
                   cfg.origin_y + (fy + 0.5) * cfg.resolution], -1)
    cc = np.asarray(c_coarse)[: int(n_coarse)]
    for p in cc:
        assert np.hypot(*(fw - p).T).min() < 0.5, p
    # blob membership: at least one target near each blob's bounding box
    near_a = (np.abs(cc[:, 0] - (cfg.origin_x + 120 * 0.05)) < 2.5) & \
             (np.abs(cc[:, 1] - (cfg.origin_y + 120 * 0.05)) < 2.5)
    near_b = (np.abs(cc[:, 0] - (cfg.origin_x + 340 * 0.05)) < 2.5) & \
             (np.abs(cc[:, 1] - (cfg.origin_y + 315 * 0.05)) < 2.5)
    assert near_a.any() and near_b.any()
    assert (np.asarray(sizes)[: int(n_coarse)] > 0).all()


def test_coarse_separation_suppression():
    cfg = GridConfig(size=512)
    coord = CoordConfig(max_frontiers=8, frontier_separation_m=2.0)
    grid = np.full((512, 512), -1, np.int8)
    grid[200:260, 200:260] = 0          # one big blob
    cents, _, n = frontier_targets_coarse(jnp.asarray(grid), cfg, coord)
    c = np.asarray(cents)[: int(n)]
    # suppression: no two targets closer than ~the separation radius
    if len(c) > 1:
        d = np.hypot(*(c[:, None] - c[None, :]).T)
        np.fill_diagonal(d, np.inf)
        assert d.min() > 1.0


def test_grouped_casting_matches_full():
    walls = make_multi_room(4, per_row=2)
    grouped = jnp.asarray(walls_by_group(walls))
    rng = np.random.default_rng(0)
    n = 16
    room = rng.integers(0, 4, n)
    ox = (room % 2) * 8.0 + rng.uniform(0.5, 5.0, n)
    oy = (room // 2) * 6.0 + rng.uniform(-1.5, 1.5, n)
    origins = jnp.asarray(np.stack([ox, oy], -1), jnp.float32)
    angles = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32)

    full = cast_rays(origins, angles, jnp.asarray(walls))
    culled = cast_rays_grouped(origins, angles, grouped,
                               jnp.asarray(room, jnp.int32))
    np.testing.assert_allclose(np.asarray(culled), np.asarray(full),
                               rtol=1e-5)


def test_exact_vs_coarse_divergence_on_engine_map():
    """r1 weak #8: grids > 512 silently switch frontier_clusters ->
    frontier_targets_coarse inside the engine. Bound the divergence of
    the two paths ON THE SAME engine-produced map at the boundary size:
    every coarse target must lie near some exact cluster, cover the same
    regions, and the greedy TARG assignment computed from the coarse
    targets must send every assigned agent toward a point close to an
    exact-path target."""
    import jax

    from swarm_tpu.coord.assign import greedy_assign
    from swarm_tpu.engine.sim import make_agent_params, sim_init, sim_rollout
    from swarm_tpu.ops.raster import tri_state_view
    from __graft_entry__ import _cfg_and_world

    cfg, walls, params, rooms = _cfg_and_world(
        8, frontiers=False, parity=False, raster_mode="beam",
        scan_rays=37, tiled=True)
    assert cfg.grid.size == 512          # the switchover boundary
    st = sim_init(cfg, params)
    final, _ = sim_rollout(st, 40, cfg, jnp.asarray(walls), params,
                           walls_grouped=rooms[0], room_of_agent=rooms[1])
    tri = tri_state_view(final.srv.logodds, cfg.grid)

    from swarm_tpu.ops.frontier import frontier_mask

    coord = cfg.coord
    c_e, _, n_e = frontier_clusters(tri, cfg.grid, coord)
    c_c, _, n_c = frontier_targets_coarse(tri, cfg.grid, coord)
    n_e, n_c = int(n_e), int(n_c)
    assert n_e > 0 and n_c > 0
    ce = np.asarray(c_e)[:n_e]
    cc = np.asarray(c_c)[:n_c]
    mask = np.asarray(frontier_mask(tri, cfg.grid))
    fy, fx = np.nonzero(mask)
    fw = np.stack([cfg.grid.origin_x + (fx + 0.5) * cfg.grid.resolution,
                   cfg.grid.origin_y + (fy + 0.5) * cfg.grid.resolution],
                  -1)
    # PRECISION: every coarse target sits on real frontier (within half a
    # pooling block + centroid blur). Coarse may also keep block-level
    # aggregates of sub-min_cluster fragments the exact path filters —
    # that is the documented approximation, so exact-centroid distance is
    # NOT bounded; on-frontier placement is.
    for p in cc:
        assert np.hypot(*(fw - p).T).min() <= 0.5, p
    # RECALL: every exact cluster is covered by a coarse target within
    # 2x the separation radius (pooling blurs <= 0.4 m; NMS merges
    # clusters closer than the separation radius by design)
    d = np.hypot(cc[None, :, 0] - ce[:, None, 0],
                 cc[None, :, 1] - ce[:, None, 1]).min(axis=1)
    # peak NMS surfaces one target per local-max basin; on a long
    # frontier ridge the nearest peak can sit up to the suppression
    # window radius away, plus the block quantization — hence the
    # separation + half-window + block-diagonal bound
    assert (d <= 2.0 * coord.frontier_separation_m + 0.6).all(), d.max()
    # and the assignment built from coarse targets sends every assigned
    # agent toward real frontier
    axy = jnp.stack([final.odom.x_est + params.x_offset,
                     final.odom.y_est], axis=-1)
    online = jnp.ones((cfg.n_agents,), bool)
    tg, has = greedy_assign(axy, online, jnp.asarray(c_c),
                            jnp.asarray(n_c), coord)
    tg, has = np.asarray(tg), np.asarray(has)
    assert has.any()
    for t in tg[has]:
        assert np.hypot(*(fw - t).T).min() <= 0.5, t


def test_peak_nms_equals_numpy_oracle():
    """frontier_targets_coarse's data-parallel peak NMS must match a
    straightforward numpy implementation of its spec exactly: a block is
    a target iff it is the unique lexicographic (count, lowest-index)
    maximum of its (2 sep+1)^2 neighborhood and count >= min_cluster;
    targets come out in ROW-MAJOR block order capped at max_frontiers
    (the same cap semantics as the exact tier: frontier_clusters
    truncates to the k_max lowest root ids), and are pairwise separated
    by more than the suppression radius."""
    from swarm_tpu.config import CoordConfig, GridConfig
    from swarm_tpu.ops.frontier import frontier_targets_coarse

    rng = np.random.default_rng(5)
    cfg = GridConfig(size=512)
    coord = CoordConfig(max_frontiers=16)
    for trial in range(3):
        grid = np.full((512, 512), -1, np.int8)
        for _ in range(40):
            y, x = rng.integers(20, 480, 2)
            h, w = rng.integers(4, 30, 2)
            grid[y:y + h, x:x + w] = 0
        g = jnp.asarray(grid)
        c, s, n = frontier_targets_coarse(g, cfg, coord)
        c, s, n = np.asarray(c), np.asarray(s), int(n)

        from swarm_tpu.ops.frontier import frontier_mask
        mask = np.asarray(frontier_mask(g, cfg)).astype(np.float64)
        nb = 512 // 8
        m = mask.reshape(nb, 8, nb, 8)
        counts = m.sum(axis=(1, 3))
        gx = np.arange(512, dtype=np.float64)
        sum_x = (mask * gx[None, :]).reshape(nb, 8, nb, 8).sum(axis=(1, 3))
        sum_y = (mask * gx[:, None]).reshape(nb, 8, nb, 8).sum(axis=(1, 3))
        sep = max(1, round(coord.frontier_separation_m / (0.05 * 8)))

        flat = np.arange(nb * nb).reshape(nb, nb)
        key = counts.astype(np.int64) * (nb * nb) + (nb * nb - 1 - flat)
        neigh = np.full((nb, nb), -1, np.int64)
        for dy in range(-sep, sep + 1):
            for dx in range(-sep, sep + 1):
                sh = np.full((nb, nb), -1, np.int64)
                ys = slice(max(0, dy), nb + min(0, dy))
                yd = slice(max(0, -dy), nb + min(0, -dy))
                xs = slice(max(0, dx), nb + min(0, dx))
                xd = slice(max(0, -dx), nb + min(0, -dx))
                sh[yd, xd] = key[ys, xs]
                neigh = np.maximum(neigh, sh)
        peak = (key == neigh) & (counts >= coord.frontier_min_cluster)
        py, px = np.nonzero(peak)          # row-major order by construction
        got = [(sum_x[y, x] / counts[y, x], sum_y[y, x] / counts[y, x],
                counts[y, x]) for y, x in
               zip(py[:coord.max_frontiers], px[:coord.max_frontiers])]
        assert n == len(got), (trial, n, len(got))
        for k, (ox, oy, ocnt) in enumerate(got):
            wx = cfg.origin_x + (ox + 0.5) * cfg.resolution
            wy = cfg.origin_y + (oy + 0.5) * cfg.resolution
            assert abs(s[k] - ocnt) < 0.5, (trial, k)
            assert abs(c[k, 0] - wx) < 1e-3 and abs(c[k, 1] - wy) < 1e-3
        # the real guarantee: pairwise block-metric separation
        if n > 1:
            cb = (c[:n] - [cfg.origin_x, cfg.origin_y]) / (0.05 * 8)
            for i in range(n):
                for j in range(i + 1, n):
                    assert max(abs(cb[i, 0] - cb[j, 0]),
                               abs(cb[i, 1] - cb[j, 1])) > sep - 1.0
