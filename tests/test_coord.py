import jax.numpy as jnp
import numpy as np

from swarm_tpu.config import CoordConfig
from swarm_tpu.coord.assign import greedy_assign
from swarm_tpu.coord.heartbeat import heartbeat_update
from swarm_tpu.coord.zones import zone_init, zone_observe, zones_for_agents


def test_heartbeat_semantics():
    last = jnp.array([0.0, 10.0, 14.0])   # never, stale, fresh
    online = np.asarray(heartbeat_update(last, now=16.0, timeout_s=5.0))
    assert list(online) == [False, False, True]
    # auto-recovery: a new packet time flips it back (ref :804-812)
    online2 = np.asarray(heartbeat_update(last.at[1].set(15.5), 16.0, 5.0))
    assert bool(online2[1])


def test_zone_running_aabb_matches_full_rescan(rng):
    z = zone_init(2)
    all_pts = {0: [], 1: []}
    for _ in range(50):
        a = int(rng.integers(0, 2))
        xs = rng.uniform(-3, 3, 5).astype(np.float32)
        ys = rng.uniform(-2, 2, 5).astype(np.float32)
        valid = rng.random(5) < 0.8
        z = zone_observe(z, a, jnp.asarray(xs), jnp.asarray(ys),
                         jnp.asarray(valid))
        all_pts[a] += [(x, y) for x, y, v in zip(xs, ys, valid) if v]
    for a in range(2):
        px = [p[0] for p in all_pts[a]]
        py = [p[1] for p in all_pts[a]]
        # reference computes min/max over the full accumulated cloud (:702-706)
        assert np.isclose(float(z.min_x[a]), min(px))
        assert np.isclose(float(z.max_x[a]), max(px))
        assert np.isclose(float(z.min_y[a]), min(py))
        assert np.isclose(float(z.max_y[a]), max(py))


def test_zones_for_agents_two_bot_reduction():
    z = zone_init(2)
    z = zone_observe(z, 0, jnp.array([0.0, 1.0]), jnp.array([0.0, 1.0]),
                     jnp.array([True, True]))
    z = zone_observe(z, 1, jnp.array([4.0, 5.0]), jnp.array([0.0, 1.0]),
                     jnp.array([True, True]))
    xy = jnp.array([[0.5, 0.5], [4.5, 0.5]])
    boxes, active = zones_for_agents(z, xy, jnp.array([True, True]))
    # agent 0's forbidden zone is agent 1's AABB and vice versa
    np.testing.assert_allclose(np.asarray(boxes[0]), [4.0, 0.0, 5.0, 1.0])
    np.testing.assert_allclose(np.asarray(boxes[1]), [0.0, 0.0, 1.0, 1.0])
    # offline other -> lift sentinel (ref :681, :942-945)
    boxes2, active2 = zones_for_agents(z, xy, jnp.array([True, False]))
    assert not bool(active2[0])
    np.testing.assert_allclose(np.asarray(boxes2[0]), [999.0, 999.0, -999.0, -999.0])
    assert bool(active2[1])


def test_greedy_assign_separation_and_order():
    cents = jnp.array([[0.0, 0.0], [0.5, 0.0], [3.0, 0.0]])
    xy = jnp.array([[0.1, 0.0], [0.4, 0.0]])
    online = jnp.array([True, True])
    tgts, has = greedy_assign(xy, online, cents, jnp.int32(3),
                              CoordConfig(frontier_separation_m=1.0))
    # agent 0 takes (0,0); agent 1 cannot take (0.5,0) (within 1 m) -> (3,0)
    assert bool(has[0]) and bool(has[1])
    np.testing.assert_allclose(np.asarray(tgts[0]), [0.0, 0.0])
    np.testing.assert_allclose(np.asarray(tgts[1]), [3.0, 0.0])
    # offline agents get nothing
    _, has2 = greedy_assign(xy, jnp.array([False, True]), cents,
                            jnp.int32(3), CoordConfig())
    assert not bool(has2[0])


def test_greedy_assign_room_boxes_restrict_candidates():
    # two closed rooms side by side: agent 0 in [0,2]x[0,2], agent 1 in
    # [3,5]x[0,2]; nearest centroid to agent 0 sits in the OTHER room and
    # must be skipped (unreachable: GO_TO_TARGET has no path planner)
    cents = jnp.array([[3.2, 1.0], [0.5, 1.5], [4.5, 0.5]])
    xy = jnp.array([[1.9, 1.0], [3.1, 1.0]])
    online = jnp.array([True, True])
    boxes = jnp.array([[0.0, 0.0, 2.0, 2.0], [3.0, 0.0, 5.0, 2.0]])
    tgts, has = greedy_assign(xy, online, cents, jnp.int32(3),
                              CoordConfig(frontier_separation_m=0.1),
                              room_boxes=boxes)
    assert bool(has[0]) and bool(has[1])
    np.testing.assert_allclose(np.asarray(tgts[0]), [0.5, 1.5])
    np.testing.assert_allclose(np.asarray(tgts[1]), [3.2, 1.0])
    # an agent whose room holds no centroid gets nothing
    boxes2 = jnp.array([[0.0, 0.0, 2.0, 2.0], [6.0, 0.0, 8.0, 2.0]])
    _, has2 = greedy_assign(xy, online, cents, jnp.int32(3),
                            CoordConfig(frontier_separation_m=0.1),
                            room_boxes=boxes2)
    assert bool(has2[0]) and not bool(has2[1])


def test_greedy_assign_rooms_matches_sequential_on_disjoint_rooms():
    """Room-parallel assignment == exact sequential greedy whenever room
    candidate sets are disjoint and cross-room targets stay separated —
    the documented equivalence domain (assign.greedy_assign_rooms)."""
    from swarm_tpu.coord.assign import greedy_assign_rooms

    rng = np.random.default_rng(11)
    coord = CoordConfig(frontier_separation_m=1.0)
    for trial in range(8):
        n_rooms = int(rng.integers(2, 6))
        per_room = int(rng.integers(1, 4))
        n = n_rooms * per_room
        boxes = []
        xy = []
        cents = []
        for r in range(n_rooms):
            # 8 m pitch keeps cross-room centroids > separation apart
            x0 = r * 8.0
            box = [x0, 0.0, x0 + 6.0, 6.0]
            boxes += [box] * per_room
            for _ in range(per_room):
                xy.append([x0 + rng.uniform(1, 5), rng.uniform(1, 5)])
            for _ in range(int(rng.integers(0, 5))):
                cents.append([x0 + rng.uniform(1, 5), rng.uniform(1, 5)])
        k = coord.max_frontiers
        c = np.zeros((k, 2), np.float32)
        n_c = min(len(cents), k)
        if n_c:
            c[:n_c] = np.asarray(cents, np.float32)[:n_c]
        online = rng.random(n) < 0.8
        args = (jnp.asarray(np.asarray(xy, np.float32)),
                jnp.asarray(online), jnp.asarray(c), jnp.int32(n_c))
        t_seq, h_seq = greedy_assign(*args, coord,
                                     room_boxes=jnp.asarray(
                                         np.asarray(boxes, np.float32)))
        t_par, h_par = greedy_assign_rooms(*args, coord,
                                           room_boxes=jnp.asarray(
                                               np.asarray(boxes,
                                                          np.float32)))
        np.testing.assert_array_equal(np.asarray(h_seq), np.asarray(h_par),
                                      err_msg=str(trial))
        np.testing.assert_allclose(np.asarray(t_par)[np.asarray(h_seq)],
                                   np.asarray(t_seq)[np.asarray(h_seq)],
                                   err_msg=str(trial))


def test_greedy_assign_rooms_conflict_lowest_index_wins():
    """A centroid inside two agents' boxes (shared-wall corner) goes to
    the lowest agent index; the loser goes targetless (documented
    deviation from sequential next-best)."""
    from swarm_tpu.coord.assign import greedy_assign_rooms

    cents = jnp.zeros((8, 2), jnp.float32).at[0].set(
        jnp.array([2.0, 1.0]))
    xy = jnp.array([[1.5, 1.0], [2.5, 1.0]], jnp.float32)
    online = jnp.array([True, True])
    # overlapping boxes put the single centroid in BOTH candidate sets;
    # distinct boxes put both agents at rank 0 (different "rooms")
    boxes = jnp.array([[0.0, 0.0, 2.5, 2.0], [1.5, 0.0, 4.0, 2.0]])
    tgts, has = greedy_assign_rooms(xy, online, cents, jnp.int32(1),
                                    CoordConfig(), room_boxes=boxes)
    assert bool(has[0]) and not bool(has[1])
    np.testing.assert_allclose(np.asarray(tgts[0]), [2.0, 1.0])
