import math

import jax
import jax.numpy as jnp
import numpy as np

from swarm_tpu.config import GridConfig
from swarm_tpu.ops.bresenham import bresenham_cells
from swarm_tpu.ops.raster import (
    RayBatch,
    logodds_raster,
    parity_raster,
    tri_state_view,
    world_to_grid,
)
from tests.oracle_mapper import OracleGrid, bresenham
from tests.oracle_mapper import world_to_grid as oracle_w2g

CFG = GridConfig()


def test_world_to_grid_truncation(rng):
    wx = rng.uniform(-6, 6, 500)
    wy = rng.uniform(-6, 6, 500)
    gx, gy = world_to_grid(jnp.asarray(wx, jnp.float32),
                           jnp.asarray(wy, jnp.float32), CFG)
    for i in range(500):
        ex, ey = oracle_w2g(float(np.float32(wx[i])), float(np.float32(wy[i])))
        assert int(gx[i]) == ex and int(gy[i]) == ey


def test_bresenham_cell_exact(rng):
    pts = rng.integers(-30, 30, size=(200, 4))
    cx, cy, valid, endpoint = bresenham_cells(
        jnp.asarray(pts[:, 0], jnp.int32), jnp.asarray(pts[:, 1], jnp.int32),
        jnp.asarray(pts[:, 2], jnp.int32), jnp.asarray(pts[:, 3], jnp.int32),
        k_max=64)
    cx, cy = np.asarray(cx), np.asarray(cy)
    valid, endpoint = np.asarray(valid), np.asarray(endpoint)
    for i in range(200):
        ref = bresenham(*pts[i])
        n = valid[i].sum()
        assert n == len(ref)
        got = list(zip(cx[i, :n], cy[i, :n]))
        assert got == ref
        # endpoint flag marks exactly the last visited cell
        assert endpoint[i].sum() == 1
        assert endpoint[i, n - 1]


def _random_rays(rng, n):
    ox = rng.uniform(-1.0, 5.0, n).astype(np.float32)
    oy = rng.uniform(-1.8, 1.8, n).astype(np.float32)
    ang = rng.uniform(-math.pi, math.pi, n).astype(np.float32)
    dist = rng.uniform(0.05, 1.2, n).astype(np.float32)
    hx = ox + dist * np.cos(ang)
    hy = oy + dist * np.sin(ang)
    hit_valid = rng.random(n) < 0.7
    return ox, oy, hx.astype(np.float32), hy.astype(np.float32), hit_valid


def test_parity_raster_matches_sequential_oracle(rng):
    n = 400
    ox, oy, hx, hy, hv = _random_rays(rng, n)

    oracle = OracleGrid()
    for i in range(n):
        oracle.update_ray(float(ox[i]), float(oy[i]), float(hx[i]),
                          float(hy[i]), bool(hv[i]))

    grid = jnp.full((CFG.size, CFG.size), CFG.unknown, jnp.int8)
    rays = RayBatch(ox=jnp.asarray(ox), oy=jnp.asarray(oy),
                    hx=jnp.asarray(hx), hy=jnp.asarray(hy),
                    hit_valid=jnp.asarray(hv),
                    active=jnp.ones(n, bool))
    new_grid, writes = jax.jit(
        lambda g, r: parity_raster(g, r, CFG))(grid, rays)
    np.testing.assert_array_equal(np.asarray(new_grid), oracle.grid)
    assert int(writes) > 0


def test_parity_raster_batch_split_equals_joint(rng):
    """Applying the batch in two ordered halves must equal one batch —
    the sequential-equivalence property."""
    n = 128
    ox, oy, hx, hy, hv = _random_rays(rng, n)
    active = np.ones(n, bool)
    mk = lambda s: RayBatch(*[jnp.asarray(a[s]) for a in (ox, oy, hx, hy, hv, active)])
    g0 = jnp.full((CFG.size, CFG.size), CFG.unknown, jnp.int8)
    joint, _ = parity_raster(g0, mk(slice(None)), CFG)
    h1, _ = parity_raster(g0, mk(slice(0, 64)), CFG)
    h2, _ = parity_raster(h1, mk(slice(64, None)), CFG)
    np.testing.assert_array_equal(np.asarray(joint), np.asarray(h2))


def test_parity_raster_inactive_rays_ignored(rng):
    n = 64
    ox, oy, hx, hy, hv = _random_rays(rng, n)
    active = np.zeros(n, bool)
    g0 = jnp.full((CFG.size, CFG.size), CFG.unknown, jnp.int8)
    rays = RayBatch(ox=jnp.asarray(ox), oy=jnp.asarray(oy),
                    hx=jnp.asarray(hx), hy=jnp.asarray(hy),
                    hit_valid=jnp.asarray(hv), active=jnp.asarray(active))
    out, writes = parity_raster(g0, rays, CFG)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(g0))
    assert int(writes) == 0


def test_logodds_accumulates_and_views(rng):
    n = 200
    ox, oy, hx, hy, _ = _random_rays(rng, n)
    hv = np.ones(n, bool)
    lo = jnp.zeros((CFG.size, CFG.size), jnp.float32)
    rays = RayBatch(ox=jnp.asarray(ox), oy=jnp.asarray(oy),
                    hx=jnp.asarray(hx), hy=jnp.asarray(hy),
                    hit_valid=jnp.asarray(hv), active=jnp.ones(n, bool))
    for _ in range(3):
        lo, writes = logodds_raster(lo, rays, CFG)
    view = np.asarray(tri_state_view(lo, CFG))
    assert (view == CFG.occupied).sum() > 0
    assert (view == CFG.free).sum() > 0
    assert (view == CFG.unknown).sum() > 0
    assert np.abs(np.asarray(lo)).max() <= CFG.logodds_clamp


def test_logodds_delta_band_partition_sums_to_full():
    """Band-restricted deltas over a disjoint row partition reconstruct the
    full-grid delta exactly, and their writes sum to the full count (the
    spatially-sharded grid primitive)."""
    import numpy as np

    from swarm_tpu.config import GridConfig
    from swarm_tpu.ops.raster import RayBatch, logodds_delta

    cfg = GridConfig(size=256, origin_x=0.0, origin_y=0.0)
    rng = np.random.default_rng(3)
    r = 64
    ox = jnp.asarray(rng.uniform(1.0, 11.0, r), jnp.float32)
    oy = jnp.asarray(rng.uniform(1.0, 11.0, r), jnp.float32)
    hx = ox + jnp.asarray(rng.uniform(-1.0, 1.0, r), jnp.float32)
    hy = oy + jnp.asarray(rng.uniform(-1.0, 1.0, r), jnp.float32)
    rays = RayBatch(ox=ox, oy=oy, hx=hx, hy=hy,
                    hit_valid=jnp.asarray(rng.random(r) < 0.7),
                    active=jnp.ones((r,), bool))

    full, w_full = logodds_delta(rays, cfg)
    parts, w_parts = [], 0
    for off in range(0, 256, 64):
        d, w = logodds_delta(rays, cfg, band=(off, 64))
        assert d.shape == (64, 256)
        parts.append(np.asarray(d))
        w_parts += int(w)
    np.testing.assert_array_equal(np.concatenate(parts, 0), np.asarray(full))
    assert w_parts == int(w_full)
