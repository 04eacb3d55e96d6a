"""Scan-matched closure measurements (slam/closurematch.py,
SlamConfig.closure_scanmatch) + rendezvous cross-agent closures
(closure_cross_radius_m).

The reference's closure is a landmark-position coincidence (~0.3 m
corner-approach spread, dual_bot_mapper.py:292-326); these tests pin the
upgrade: stored-scan vs current-scan correlative matching turns a fired
closure into a cm-grade SE(2) edge measurement that the offline refiners
consume.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from swarm_tpu.config import SlamConfig, SwarmConfig
from swarm_tpu.models.scan import sense_scan_true
from swarm_tpu.slam.closure import closure_add_poses_batch, closure_init
from swarm_tpu.slam.closurematch import match_scan_pair

WALLS = jnp.asarray([
    [0.0, 0.0, 3.0, 0.0], [3.0, 0.0, 3.0, 3.0],
    [3.0, 3.0, 0.0, 3.0], [0.0, 3.0, 0.0, 0.0],
    [1.8, 0.0, 1.8, 1.0],
], jnp.float32)


def test_match_scan_pair_recovers_injected_error():
    """Two noise-free views of the same room; the current pose's estimate
    carries a known (0.10, -0.06, 0.05) error — the matched SE(2) edge
    measurement must recover the true relative pose to a few cm."""
    cfg = SwarmConfig()
    pa = jnp.asarray([1.3, 0.7, -0.2])
    pb = jnp.asarray([1.5, 0.6, -0.5])
    sa = sense_scan_true(pa, WALLS)
    sb = sense_scan_true(pb, WALLS)
    err = np.array([0.10, -0.06, 0.05], np.float32)
    pb_est = np.asarray(pb) + err
    m, meas = match_scan_pair(sb, tuple(pb_est), sa, tuple(np.asarray(pa)),
                              cfg.slam, cfg.grid, cfg.sensors)
    assert bool(m.ok) and float(m.fitness) > 0.8
    d = np.asarray(pb[:2]) - np.asarray(pa[:2])
    ct, st = np.cos(float(pa[2])), np.sin(float(pa[2]))
    true_meas = np.array([ct * d[0] + st * d[1], -st * d[0] + ct * d[1],
                          float(pb[2] - pa[2])])
    res = np.asarray(meas) - true_meas
    assert np.abs(res[:2]).max() < 0.05          # translation to ~1 cell
    assert abs(res[2]) < 0.04                    # theta below hypothesis step


def test_match_scan_pair_gates_nonoverlapping_views():
    """Disjoint wall structure (a view of nothing near vs a corner view)
    must fail the fitness gate instead of fabricating a measurement."""
    cfg = SwarmConfig()
    pa = jnp.asarray([1.3, 0.7, -0.2])
    sa = sense_scan_true(pa, WALLS)
    # current scan: all ranges beyond the match trust range -> no points
    sb = jnp.full((181,), 3.9, jnp.float32)
    m, _ = match_scan_pair(sb, (1.4, 0.8, 0.1), sa,
                           tuple(np.asarray(pa)),
                           cfg.slam, cfg.grid, cfg.sensors)
    assert not bool(m.ok)


def test_batch_closure_logs_measurement():
    """The batched closure path must store scans with landmarks and log a
    fitness-gated measurement when a revisit fires."""
    slam = dataclasses.replace(
        SlamConfig(), closure_scanmatch=True, min_poses_between=2,
        closure_same_agent_only=True)
    cfg = SwarmConfig(slam=slam)
    R = 181
    st = closure_init(1, slam, scan_rays=R)
    pa = jnp.asarray([1.3, 0.7, -0.2])
    scan_a = sense_scan_true(pa, WALLS)

    # packet 1: store the landmark (+ scan + yaw)
    st, closed, _, _ = closure_add_poses_batch(
        st, pa[:1], pa[1:2], jnp.zeros(1, jnp.int32),
        jnp.asarray([5], jnp.int32), slam,
        yaws=pa[2:3], scans=scan_a[None], grid=cfg.grid, sens=cfg.sensors)
    assert not bool(closed[0])
    np.testing.assert_allclose(np.asarray(st.lm_scan[0]),
                               np.asarray(scan_a), atol=1e-6)
    assert float(st.lm_yaw[0]) == np.float32(-0.2)

    # padding packets to clear the node-index gap
    for _ in range(3):
        st, _, _, _ = closure_add_poses_batch(
            st, pa[:1], pa[1:2], jnp.zeros(1, jnp.int32),
            jnp.zeros(1, jnp.int32), slam,
            yaws=pa[2:3], scans=scan_a[None],
            grid=cfg.grid, sens=cfg.sensors)

    # revisit nearby with a drifted estimate: closure fires + measured
    pb = jnp.asarray([1.5, 0.6, -0.5])
    scan_b = sense_scan_true(pb, WALLS)
    est = jnp.asarray([1.6, 0.54, -0.45])
    st, closed, _, _ = closure_add_poses_batch(
        st, est[:1], est[1:2], jnp.zeros(1, jnp.int32),
        jnp.asarray([5], jnp.int32), slam,
        yaws=est[2:3], scans=scan_b[None], grid=cfg.grid, sens=cfg.sensors)
    assert bool(closed[0])
    assert int(st.cl_count) == 1
    fit = float(st.cl_fit[0])
    assert fit >= slam.merge_fitness_min
    # the measurement must beat the raw-estimate relative pose
    d = np.asarray(pb[:2]) - np.asarray(pa[:2])
    ct, s_ = np.cos(-0.2), np.sin(-0.2)
    true_t = np.array([ct * d[0] + s_ * d[1], -s_ * d[0] + ct * d[1]])
    meas_t = np.array([float(st.cl_mx[0]), float(st.cl_my[0])])
    de = np.asarray(est[:2]) - np.asarray(pa[:2])
    est_t = np.array([ct * de[0] + s_ * de[1], -s_ * de[0] + ct * de[1]])
    assert np.linalg.norm(meas_t - true_t) < \
        np.linalg.norm(est_t - true_t)


def test_rendezvous_cross_agent_closure():
    """closure_cross_radius_m: another agent's stored landmark within the
    cross radius matches with no type equality and no time gap; the
    reference-style term alone (radius 0.6 m + same type) cannot fire
    here."""
    slam = dataclasses.replace(
        SlamConfig(), closure_scanmatch=True, closure_cross_radius_m=1.2,
        min_poses_between=400, closure_same_agent_only=True)
    st = closure_init(2, slam, scan_rays=8)
    scans = jnp.ones((2, 8))
    st, closed, _, _ = closure_add_poses_batch(
        st, jnp.asarray([1.0, 9.0]), jnp.asarray([1.0, 9.0]),
        jnp.asarray([0, 1], jnp.int32), jnp.asarray([5, 0], jnp.int32),
        slam, yaws=jnp.zeros(2), scans=scans, grid=None, sens=None)
    assert int(st.lm_count) == 1
    # agent 1 detects a DIFFERENT type 0.8 m from agent 0's landmark,
    # 0 node gap — the rendezvous term fires where the reference cannot
    st, closed, _, _ = closure_add_poses_batch(
        st, jnp.asarray([5.0, 1.8]), jnp.asarray([5.0, 1.0]),
        jnp.asarray([0, 1], jnp.int32), jnp.asarray([0, 2], jnp.int32),
        slam, yaws=jnp.zeros(2), scans=scans, grid=None, sens=None)
    assert bool(closed[1]) and not bool(closed[0])
    assert int(st.cl_count) == 1

    # radius 0 = reference behavior: no cross match
    slam_off = dataclasses.replace(slam, closure_cross_radius_m=0.0)
    st2 = closure_init(2, slam_off, scan_rays=8)
    st2, _, _, _ = closure_add_poses_batch(
        st2, jnp.asarray([1.0, 9.0]), jnp.asarray([1.0, 9.0]),
        jnp.asarray([0, 1], jnp.int32), jnp.asarray([5, 0], jnp.int32),
        slam_off, yaws=jnp.zeros(2), scans=scans, grid=None, sens=None)
    st2, closed2, _, _ = closure_add_poses_batch(
        st2, jnp.asarray([5.0, 1.8]), jnp.asarray([5.0, 1.0]),
        jnp.asarray([0, 1], jnp.int32), jnp.asarray([0, 2], jnp.int32),
        slam_off, yaws=jnp.zeros(2), scans=scans, grid=None, sens=None)
    assert not bool(closed2[1])


def test_joint_drops_unverified_cross_edges():
    """A scan-matching log's cross-agent edge WITHOUT a passing fitness is
    a failed rendezvous verification — the joint splitter must drop it
    (kept coincidence cross edges measurably dragged the joint solve)."""
    from swarm_tpu.slam.joint import split_closures

    t_steps, n = 20, 2
    session = {
        "t": np.repeat(np.arange(t_steps, dtype=np.float64), n),
        "agent": np.tile(np.arange(1, n + 1), t_steps),
        "x": np.zeros(t_steps * n), "y": np.zeros(t_steps * n),
        "yaw_deg": np.zeros(t_steps * n),
        "landmark": np.zeros(t_steps * n, np.int64),
    }
    ni = np.array([0, 2], np.int64)      # agent 1 rows
    nj = np.array([11, 13], np.int64)    # agent 2 rows
    ag = np.array([2, 2], np.int64)
    meas = np.array([[0.1, 0.0, 0.0], [0.2, 0.0, 0.0]], np.float32)
    fit = np.array([0.9, 0.3], np.float32)   # second fails the gate
    intra, intra_meas, inter, _ = split_closures(
        session, (ni, nj, ag, meas, fit))
    assert len(inter) == 1
    assert inter[0][4] is not None           # the verified edge, measured
    # legacy log (no fit column): both kept as coincidence
    _, _, inter2, _ = split_closures(session, (ni, nj, ag))
    assert len(inter2) == 2
    assert all(e[4] is None for e in inter2)


def test_checkpoint_migration_new_closure_leaves(tmp_path):
    """Checkpoints written before the scan-match leaves existed must load
    with zero-filled scans and the -1 'unmeasured' fitness sentinel."""
    from swarm_tpu.engine.checkpoint import load_pytree, save_pytree
    from swarm_tpu.engine.sim import sim_init, make_agent_params

    cfg = SwarmConfig(n_agents=2)
    state = sim_init(cfg, make_agent_params(2))
    path = str(tmp_path / "old.npz")
    save_pytree(path, state)
    # strip the r3 leaves to mimic an r2-era checkpoint
    data = dict(np.load(path))
    for k in list(data):
        if any(k.endswith(s) for s in
               (".lm_yaw", ".lm_scan", ".cl_mx", ".cl_my",
                ".cl_mth", ".cl_fit")):
            del data[k]
    np.savez(path, **data)
    loaded = load_pytree(path, state)
    assert np.all(np.asarray(loaded.srv.closure.cl_fit) == -1.0)
    assert np.all(np.asarray(loaded.srv.closure.lm_scan) == 0.0)


def test_sharded_engine_runs_with_scanmatch():
    """The mesh-sharded engine gathers sweeps and runs the measured-
    closure path (parallel/sharded.py): must compile and keep the
    closure state identical to the fused engine over the same steps
    (the matcher's lax.cond + the [N, R] scan all_gather must not
    perturb anything when no closure fires)."""
    from swarm_tpu.config import EngineConfig, GridConfig
    from swarm_tpu.engine.sim import (make_agent_params, make_sim_step,
                                      sim_init)
    from swarm_tpu.geom.world import BEDROOM_WALLS
    from swarm_tpu.parallel import (make_mesh, make_sharded_sim_step,
                                    shard_state)

    n = 4
    eng = EngineConfig(parity_mode=False, compute_frontiers=False,
                       raster_mode="beam", scan_rays=37, raster_4way=False,
                       beam_groups=8, kernel_endpoints=False,
                       endpoint_hits=True, merge_every=0)
    slam = dataclasses.replace(
        SlamConfig(), closure_scanmatch=True, closure_correction=0.0,
        closure_cross_radius_m=1.2)
    grid = dataclasses.replace(GridConfig(), size=512,
                               origin_x=-3.0, origin_y=-4.0)
    cfg = SwarmConfig(n_agents=n, grid=grid, engine=eng, slam=slam)
    params = make_agent_params(n, separation=2.0, cfg=cfg)

    mesh = make_mesh(2)
    sh_step = make_sharded_sim_step(cfg, BEDROOM_WALLS, params, mesh,
                                    donate=False)
    st_sh = shard_state(sim_init(cfg, params), mesh)
    ref_step = make_sim_step(cfg, BEDROOM_WALLS, params, donate=False)
    st_ref = sim_init(cfg, params)
    for _ in range(10):
        st_sh, _ = sh_step(st_sh)
        st_ref, _ = ref_step(st_ref)
    assert st_sh.srv.closure.lm_scan.shape == (slam.landmark_capacity, 37)
    assert int(st_sh.srv.closure.cl_count) == \
        int(st_ref.srv.closure.cl_count)
    np.testing.assert_allclose(np.asarray(st_sh.srv.closure.lm_x),
                               np.asarray(st_ref.srv.closure.lm_x),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_sh.srv.closure.lm_scan),
                               np.asarray(st_ref.srv.closure.lm_scan),
                               atol=1e-6)


def test_proximity_pair_rendezvous_logs_measured_cross_edge():
    """SlamConfig.closure_pair_budget (r5): two co-located agents'
    CURRENT scans are matched scan-to-scan at the closure step and a
    fitness-verified measured cross-agent edge lands in the log —
    without either agent detecting a landmark. Far-away agents must not
    pair, and the attempted agents' cooldown is consumed."""
    import jax
    import numpy as np
    from swarm_tpu.config import (GridConfig, SensorConfig, SlamConfig)
    from swarm_tpu.slam.closure import (closure_add_poses_batch,
                                        closure_init)

    slam = SlamConfig(closure_scanmatch=True, closure_cross_radius_m=1.2,
                      closure_pair_budget=4, closure_pair_cooldown=8,
                      closure_match_window=96, closure_match_search=12,
                      closure_match_chunk=4)
    grid = GridConfig(size=256, origin_x=-3.0, origin_y=-3.0)
    sens = SensorConfig(max_range=3.0)
    n, r = 4, 181
    rel = np.linspace(-np.pi / 2, np.pi / 2, r)

    def mkscan(x, y, yaw):
        d = np.full(r, np.inf)
        for i, a in enumerate(rel):
            c, s = np.cos(yaw + a), np.sin(yaw + a)
            if c > 1e-6:
                d[i] = min(d[i], (2.0 - x) / c)
            if s > 1e-6:
                d[i] = min(d[i], (2.0 - y) / s)
        d[~np.isfinite(d)] = 4.0
        return np.clip(d, 0, 4.0).astype(np.float32)

    # agents 0, 1 share a corner (walls x=2, y=2); 2, 3 are far away.
    # agent 1 REPORTS a pose offset (0.15, -0.10) from where its scan
    # was actually taken — the edge measurement must recover the truth.
    xs_t = np.array([0.6, 1.0, 8.0, 12.0], np.float32)
    ys_t = np.array([0.8, 0.5, 8.0, 12.0], np.float32)
    yaws = np.array([0.3, 0.5, 0.0, 0.0], np.float32)
    scans = np.stack([mkscan(xs_t[i], ys_t[i], yaws[i])
                      for i in range(n)])
    xs = xs_t.copy(); ys = ys_t.copy()
    xs[1] += 0.15; ys[1] -= 0.10

    st = closure_init(n, slam, scan_rays=r)
    new, _, _, _ = jax.jit(lambda s: closure_add_poses_batch(
        s, jnp.asarray(xs), jnp.asarray(ys),
        jnp.arange(n, dtype=jnp.int32), jnp.zeros(n, jnp.int32), slam,
        valid=jnp.ones(n, bool), yaws=jnp.asarray(yaws),
        scans=jnp.asarray(scans), grid=grid, sens=sens))(st)

    c = int(new.cl_count)
    assert c == 1, c
    # pair (0, 1): stored node = j=1's node, current = i=0's node
    assert int(new.cl_lm_node[0]) == 1 and int(new.cl_node[0]) == 0
    assert float(new.cl_fit[0]) >= 0.6
    # measurement (frame of stored node 1): R(-yaw1) @ (p0 - p1_true)
    ct, s_ = np.cos(yaws[1]), np.sin(yaws[1])
    dx, dy = xs_t[0] - xs_t[1], ys_t[0] - ys_t[1]
    exp = np.array([ct * dx + s_ * dy, -s_ * dx + ct * dy,
                    yaws[0] - yaws[1]])
    got = np.array([float(new.cl_mx[0]), float(new.cl_my[0]),
                    float(new.cl_mth[0])])
    np.testing.assert_allclose(got, exp, atol=0.08)
    # cooldown consumed for 0 and 1 only
    lp = np.asarray(new.last_pair_node)
    assert lp[0] >= 0 and lp[1] >= 0 and lp[2] < 0 and lp[3] < 0
