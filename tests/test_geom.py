import math

import jax.numpy as jnp
import numpy as np

from swarm_tpu.geom import BEDROOM_WALLS, cast_rays, make_rect_room
from swarm_tpu.geom.world import RAY_MISS, make_multi_room


def ref_ray_segment(ox, oy, angle, seg):
    """Reference semantics (generate_fake_dual_session.py:67-90)."""
    dx, dy = math.cos(angle), math.sin(angle)
    sx1, sy1, sx2, sy2 = seg
    dsx, dsy = sx2 - sx1, sy2 - sy1
    denom = dx * dsy - dy * dsx
    if abs(denom) < 1e-10:
        return None
    t = ((sx1 - ox) * dsy - (sy1 - oy) * dsx) / denom
    u = ((sx1 - ox) * dy - (sy1 - oy) * dx) / denom
    if t > 0.001 and 0.0 <= u <= 1.0:
        return t
    return None


def ref_cast(ox, oy, angle, walls):
    best = float("inf")
    for seg in walls:
        d = ref_ray_segment(ox, oy, angle, seg)
        if d is not None and d < best:
            best = d
    return best if best < 50.0 else 99.0


def test_cast_matches_reference_semantics(rng):
    walls = BEDROOM_WALLS
    n = 256
    ox = rng.uniform(0.0, 5.0, n)
    oy = rng.uniform(-1.8, 1.8, n)
    ang = rng.uniform(-math.pi, math.pi, n)
    got = np.asarray(cast_rays(
        jnp.stack([jnp.asarray(ox, jnp.float32),
                   jnp.asarray(oy, jnp.float32)], -1),
        jnp.asarray(ang, jnp.float32), jnp.asarray(walls)))
    want = np.array([ref_cast(a, b, c, walls) for a, b, c in zip(ox, oy, ang)])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_cast_inside_unit_room():
    walls = jnp.asarray(make_rect_room(0.0, 0.0, 2.0, 2.0))
    o = jnp.array([[1.0, 1.0]])
    d_east = cast_rays(o, jnp.array([0.0]), walls)
    d_north = cast_rays(o, jnp.array([math.pi / 2]), walls)
    np.testing.assert_allclose(np.asarray(d_east), [1.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_north), [1.0], atol=1e-5)


def test_miss_sentinel():
    # Ray fired from outside the room, away from it.
    walls = jnp.asarray(make_rect_room(0.0, 0.0, 1.0, 1.0))
    d = cast_rays(jnp.array([[5.0, 5.0]]), jnp.array([0.0]), walls)
    assert float(d[0]) == RAY_MISS


def test_multi_room_layout():
    walls = make_multi_room(4, per_row=2)
    assert walls.shape == (16, 4)
    # Agent in room 0 must not see room 1's walls within range.
    d = cast_rays(jnp.array([[2.5, 0.0]]), jnp.array([0.0]),
                  jnp.asarray(walls))
    assert float(d[0]) <= 3.0 + 1e-5
