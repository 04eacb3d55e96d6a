"""Fused closed-loop engine tests: behavior, fault injection, and
single-chip vs mesh-sharded equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swarm_tpu.config import EngineConfig, GridConfig, SwarmConfig
from swarm_tpu.engine.sim import (
    FaultSchedule, make_agent_params, make_sim_step, no_faults, sim_init,
    sim_rollout)
from swarm_tpu.geom.world import BEDROOM_WALLS
from swarm_tpu.parallel import make_mesh, make_sharded_sim_step, shard_state


def dual_cfg(**eng):
    return SwarmConfig(n_agents=2, engine=EngineConfig(**eng))


def test_dual_bot_explores_and_maps():
    cfg = dual_cfg()
    params = make_agent_params(2, separation=5.0, cfg=cfg)
    st = sim_init(cfg, params)
    final, ms = jax.jit(lambda s: sim_rollout(
        s, 150, cfg, jnp.asarray(BEDROOM_WALLS), params))(st)
    # both bots moved, stayed in the room, and built a map
    assert float(jnp.min(final.total_dist)) > 1.0
    g = np.asarray(final.srv.grid)
    assert (g == cfg.grid.free).sum() > 500
    assert (g == cfg.grid.occupied).sum() > 20
    assert int(ms.online[-1]) == 2
    # true poses stay inside the walls (collision clamp works)
    xy = np.asarray(final.pose_true[:, :2])
    assert (xy[:, 0] > -0.6).all() and (xy[:, 0] < 5.6).all()
    assert (np.abs(xy[:, 1]) < 2.1).all()


def test_total_writes_counts_match_metrics():
    cfg = dual_cfg()
    params = make_agent_params(2, cfg=cfg)
    st = sim_init(cfg, params)
    final, ms = jax.jit(lambda s: sim_rollout(
        s, 50, cfg, jnp.asarray(BEDROOM_WALLS), params))(st)
    from swarm_tpu.engine.sim import total_writes_value
    assert total_writes_value(final.srv.total_writes) == int(jnp.sum(ms.writes))


def test_fault_injection_heartbeat_offline():
    """Killing agent 1 mid-run marks it OFFLINE after the 5 s timeout and
    lifts its zone (dual_bot_mapper.py:804-812, 942-945)."""
    cfg = dual_cfg()
    params = make_agent_params(2, cfg=cfg)
    # dt = 0.4 s; kill agent 1 from t=8 onwards
    faults = FaultSchedule(agent=jnp.array([1], jnp.int32),
                           t_start=jnp.array([8.0]),
                           t_end=jnp.array([1e9]))
    st = sim_init(cfg, params)
    final, ms = jax.jit(lambda s: sim_rollout(
        s, 60, cfg, jnp.asarray(BEDROOM_WALLS), params, faults))(st)
    online = np.asarray(ms.online)
    assert online[10] == 2          # both alive early (t=4.4)
    assert online[-1] == 1          # agent 1 offline at t=24
    # the dead agent stopped moving
    d = np.asarray(final.total_dist)
    assert d[0] > d[1]


def test_fault_recovery():
    """Agent comes back online when its fault window ends."""
    cfg = dual_cfg()
    params = make_agent_params(2, cfg=cfg)
    faults = FaultSchedule(agent=jnp.array([1], jnp.int32),
                           t_start=jnp.array([4.0]),
                           t_end=jnp.array([12.0]))
    st = sim_init(cfg, params)
    _, ms = jax.jit(lambda s: sim_rollout(
        s, 80, cfg, jnp.asarray(BEDROOM_WALLS), params, faults))(st)
    online = np.asarray(ms.online)
    assert online[-1] == 2


def test_throughput_mode_runs():
    cfg = dual_cfg(parity_mode=False)
    params = make_agent_params(2, cfg=cfg)
    st = sim_init(cfg, params)
    final, _ = jax.jit(lambda s: sim_rollout(
        s, 60, cfg, jnp.asarray(BEDROOM_WALLS), params))(st)
    lo = np.asarray(final.srv.logodds)
    assert (lo < 0).sum() > 300     # free evidence
    assert (lo > 0).sum() > 10      # occupied evidence


@pytest.mark.parametrize("n_devices", [1, 4])
def test_sharded_matches_single_chip(n_devices):
    """The mesh-sharded step must reproduce the single-chip throughput step:
    per-agent RNG streams are folded by GLOBAL agent id, so trajectories and
    the psum-merged map are identical under any sharding."""
    n = 8
    cfg = SwarmConfig(
        n_agents=n,
        grid=GridConfig(size=256, origin_x=-3.0, origin_y=-4.0),
        engine=EngineConfig(parity_mode=False, compute_frontiers=False))
    params = make_agent_params(n, separation=2.0, cfg=cfg)
    walls = BEDROOM_WALLS
    steps = 12

    mesh = make_mesh(n_devices)
    st0 = sim_init(cfg, params)
    sh_step = make_sharded_sim_step(cfg, walls, params, mesh, donate=False)
    st_sh = shard_state(st0, mesh)
    for _ in range(steps):
        st_sh, m_sh = sh_step(st_sh)

    # single-chip reference
    ref_step = make_sim_step(cfg, walls, params, donate=False)
    st_ref = st0
    for _ in range(steps):
        st_ref, m_ref = ref_step(st_ref)

    np.testing.assert_allclose(np.asarray(st_sh.odom.x_est),
                               np.asarray(st_ref.odom.x_est),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_sh.pose_true),
                               np.asarray(st_ref.pose_true),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_sh.srv.logodds),
                               np.asarray(st_ref.srv.logodds),
                               rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(st_sh.nav.state),
                          np.asarray(st_ref.nav.state))
    assert int(m_sh.online) == int(m_ref.online) == n


def test_sharded_rng_sharding_consistency():
    """Per-shard RNG must give DIFFERENT noise to different agents."""
    n = 8
    cfg = SwarmConfig(
        n_agents=n,
        grid=GridConfig(size=256, origin_x=-3.0, origin_y=-4.0),
        engine=EngineConfig(parity_mode=False, compute_frontiers=False))
    params = make_agent_params(n, separation=2.0, cfg=cfg)
    mesh = make_mesh(4)
    step = make_sharded_sim_step(cfg, BEDROOM_WALLS, params, mesh,
                                 donate=False)
    st = shard_state(sim_init(cfg, params), mesh)
    for _ in range(5):
        st, _ = step(st)
    x = np.asarray(st.odom.x_est)
    assert len(np.unique(np.round(x, 6))) > 4
