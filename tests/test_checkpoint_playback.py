"""Checkpoint/resume exactness + playback frame rendering + scan mode."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from swarm_tpu.config import EngineConfig, SwarmConfig
from swarm_tpu.engine.checkpoint import load_pytree, save_pytree
from swarm_tpu.engine.sim import make_agent_params, sim_init, sim_rollout
from swarm_tpu.geom.world import BEDROOM_WALLS


def test_checkpoint_resume_bit_exact(tmp_path):
    """run 40 steps straight == run 20, checkpoint, reload, run 20."""
    cfg = SwarmConfig(n_agents=2)
    params = make_agent_params(2, cfg=cfg)
    walls = jnp.asarray(BEDROOM_WALLS)
    roll = jax.jit(lambda s, n: sim_rollout(s, n, cfg, walls, params),
                   static_argnums=1)

    st0 = sim_init(cfg, params)
    full, _ = roll(st0, 40)

    half, _ = roll(st0, 20)
    ck = str(tmp_path / "ck.npz")
    save_pytree(ck, half)
    resumed = load_pytree(ck, sim_init(cfg, params))
    done, _ = roll(resumed, 20)

    for name, a, b in [("grid", full.srv.grid, done.srv.grid),
                       ("pose", full.pose_true, done.pose_true),
                       ("odom", full.odom.x_est, done.odom.x_est),
                       ("t", full.t, done.t)]:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_checkpoint_shape_mismatch_raises(tmp_path):
    cfg2 = SwarmConfig(n_agents=2)
    cfg4 = SwarmConfig(n_agents=4)
    st2 = sim_init(cfg2, make_agent_params(2, cfg=cfg2))
    st4 = sim_init(cfg4, make_agent_params(4, cfg=cfg4))
    ck = str(tmp_path / "ck.npz")
    save_pytree(ck, st2)
    try:
        load_pytree(ck, st4)
        raise AssertionError("expected shape mismatch")
    except ValueError as e:
        assert "shape" in str(e)


def test_scan_mode_maps_faster_than_4way():
    walls = jnp.asarray(BEDROOM_WALLS)
    params4 = make_agent_params(2)

    cfg4 = SwarmConfig(n_agents=2, engine=EngineConfig(
        parity_mode=False, compute_frontiers=False))
    f4, m4 = jax.jit(lambda s: sim_rollout(
        s, 20, cfg4, walls, params4))(sim_init(cfg4, params4))

    cfgs = SwarmConfig(n_agents=2, engine=EngineConfig(
        parity_mode=False, compute_frontiers=False, scan_rays=181))
    fs, mss = jax.jit(lambda s: sim_rollout(
        s, 20, cfgs, walls, params4))(sim_init(cfgs, params4))

    from swarm_tpu.engine.sim import total_writes_value
    assert total_writes_value(fs.srv.total_writes) > \
        20 * total_writes_value(f4.srv.total_writes)
    # scan mode must cover far more of the room in the same steps
    free4 = int((np.asarray(f4.srv.logodds) < -0.3).sum())
    frees = int((np.asarray(fs.srv.logodds) < -0.3).sum())
    assert frees > free4


def test_playback_frames(tmp_path):
    from swarm_tpu.cli.playback import playback
    from swarm_tpu.proto.csvio import write_session
    from swarm_tpu.sim.scenario import generate_dual_session

    res = generate_dual_session(seed=42)
    # include hit points so frames show clouds
    import math
    angles = np.asarray([0.0, math.pi / 2, math.pi, -math.pi / 2])
    valid = (res.dist4 > 0.05) & (res.dist4 <= 1.2)
    ang = res.yaw_q[:, None] + angles[None, :]
    hx = res.x[:, None] + res.dist4 * np.cos(ang)
    hy = res.y[:, None] + res.dist4 * np.sin(ang)
    sess_dir = write_session(str(tmp_path / "s"), res.t, res.agent, res.x,
                             res.y, res.yaw_q, res.encoder, res.v2v,
                             res.dist4, res.landmark,
                             hits_xy=np.stack([hx, hy], -1),
                             hit_valid=valid)
    frames = playback(sess_dir, str(tmp_path / "frames"), frame_dt=60.0,
                      scale=2, gif=str(tmp_path / "p.gif"))
    assert len(frames) >= 3
    assert all(os.path.getsize(f) > 0 for f in frames)
    assert os.path.getsize(tmp_path / "p.gif") > 0


def test_checkpoint_migration_shims(tmp_path):
    """Advisor r2: checkpoints written before the r2/r3 MapState schema
    changes (scalar f32 total_writes; no merge_* / v2v_total leaves) load
    through the migration registry — counter converted to the (hi, lo)
    pair, new accumulators default-zeroed. Unknown mismatches still fail
    loudly."""
    import numpy as np
    import pytest

    from swarm_tpu.config import SwarmConfig
    from swarm_tpu.engine.checkpoint import load_pytree, save_pytree
    from swarm_tpu.engine.sim import (make_agent_params, sim_init,
                                      total_writes_value)

    cfg = SwarmConfig(n_agents=2)
    state = sim_init(cfg, make_agent_params(2))
    p = str(tmp_path / "old.npz")
    save_pytree(p, state)

    # rewrite the npz as the r1-era schema: scalar float32 counter, no
    # merge_dx/dy/dyaw, no v2v_total
    data = dict(np.load(p))
    k_tw = [k for k in data if k.endswith(".srv.total_writes")][0]
    data[k_tw] = np.float32(3.0 * (1 << 30))   # f32-exact value
    for k in list(data):
        if any(k.endswith(s) for s in (".srv.merge_dx", ".srv.merge_dy",
                                       ".srv.merge_dyaw", ".v2v_total")):
            del data[k]
    np.savez_compressed(p, **data)

    loaded = load_pytree(p, state)
    assert total_writes_value(loaded.srv.total_writes) == 3 * (1 << 30)
    assert np.asarray(loaded.srv.merge_dx).sum() == 0
    assert np.asarray(loaded.v2v_total).sum() == 0

    # strict mode still refuses the old layout
    with pytest.raises(ValueError):
        load_pytree(p, state, migrate=False)
