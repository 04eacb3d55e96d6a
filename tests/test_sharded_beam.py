"""Mesh-sharded step with the beam-model raster: delta+psum decomposition
must match the single-chip beam engine."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from swarm_tpu.config import EngineConfig, GridConfig, SwarmConfig
from swarm_tpu.engine.sim import make_agent_params, make_sim_step, sim_init
from swarm_tpu.geom.world import BEDROOM_WALLS
from swarm_tpu.parallel import make_mesh, make_sharded_sim_step, shard_state


def test_sharded_beam_matches_single_chip():
    """The sharded beam path = fast tier (grouped free space + exact
    endpoint scatter); compare against the single-chip fast tier (pallas
    kernel in interpret mode, exact endpoints)."""
    n = 8
    eng = EngineConfig(parity_mode=False, compute_frontiers=False,
                       raster_mode="beam", scan_rays=37,
                       raster_4way=False, beam_groups=8,
                       kernel_endpoints=False, endpoint_hits=True)
    grid = GridConfig(size=512, origin_x=-3.0, origin_y=-4.0)
    params_cfg = SwarmConfig(n_agents=n, grid=grid, engine=eng)
    params = make_agent_params(n, separation=2.0, cfg=params_cfg)
    walls = BEDROOM_WALLS
    steps = 8

    cfg_sh = params_cfg.replace(engine=dataclasses.replace(
        eng, use_pallas=False))      # sharded body uses the XLA fast tier
    mesh = make_mesh(4)
    sh_step = make_sharded_sim_step(cfg_sh, walls, params, mesh,
                                    donate=False)
    st_sh = shard_state(sim_init(cfg_sh, params), mesh)
    for _ in range(steps):
        st_sh, m_sh = sh_step(st_sh)

    cfg_ref = params_cfg.replace(engine=dataclasses.replace(
        eng, use_pallas=True))
    ref_step = make_sim_step(cfg_ref, walls, params, donate=False)
    st_ref = sim_init(cfg_ref, params)
    with pltpu.force_tpu_interpret_mode():
        for _ in range(steps):
            st_ref, m_ref = ref_step(st_ref)

    # trajectories identical (same RNG streams, raster doesn't feed nav)
    np.testing.assert_allclose(np.asarray(st_sh.pose_true),
                               np.asarray(st_ref.pose_true),
                               rtol=1e-5, atol=1e-6)
    # maps: kernel uses a polynomial atan2, the XLA tier exact arctan2 —
    # only borderline beam-bin cells may flip
    diff = np.abs(np.asarray(st_sh.srv.logodds) -
                  np.asarray(st_ref.srv.logodds))
    assert (diff > 1e-3).sum() <= 64, (diff > 1e-3).sum()
    # writes: analytic path-cell count (kernel tier) vs painted-cell count
    # (XLA tier) — same order, different estimators
    assert 0.5 < int(m_sh.writes) / max(int(m_ref.writes), 1) < 2.0


def test_sharded_pallas_kernels_match_xla_tier():
    """cfg.engine.use_pallas routes the sharded body's raster through the
    per-shard Pallas kernels on banded grid windows — the multi-chip
    deployment path; the XLA fast tier remains the CPU-mesh reference.

    Engine-level check on the rows decomposition (4 devices); the tiles
    decomposition has its own direct execution below
    (test_sharded_tiles_pallas_kernels_match_xla_tier, VERDICT r3
    item 3 — previously claimed by transitivity only)."""
    import pytest

    from tests.test_sharded_spatial import _vertical_world

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")

    vcfg, vwalls, vparams, vwg, vroa = _vertical_world(4)
    outs = {}
    for use_pallas in (False, True):
        c = vcfg.replace(engine=dataclasses.replace(
            vcfg.engine, use_pallas=use_pallas))
        step = make_sharded_sim_step(
            c, vwalls, vparams, make_mesh(4), donate=False,
            grid_sharding="rows", walls_grouped=vwg, room_of_agent=vroa)
        st = shard_state(sim_init(c, vparams), make_mesh(4),
                         grid_rows_sharded=True)
        with pltpu.force_tpu_interpret_mode():
            for _ in range(3):
                st, m = step(st)
        outs[use_pallas] = (np.asarray(st.srv.logodds), int(m.writes))
    lo_x, w_x = outs[False]
    lo_p, w_p = outs[True]
    diff = np.abs(lo_p - lo_x)
    assert (diff > 1e-3).sum() <= 64, (diff > 1e-3).sum()
    # write semantics differ (painted count vs analytic claim) but stay
    # the same order of magnitude
    assert 0.4 < w_p / max(w_x, 1) < 2.5, (w_p, w_x)


def test_sharded_tiles_pallas_kernels_match_xla_tier():
    """Tiles decomposition x Pallas kernels EXECUTED multi-device
    (VERDICT r3 item 3): a 2x2 tile mesh runs the halo exchange +
    grid-edge guard + banded-window kernel combination under the Mosaic
    interpreter, cross-checked against the tiles-XLA tier — the exact
    interaction the old transitivity argument (tiles-XLA == replicated,
    plus single-device kernel bit-exactness) did not cover.

    4 devices with an 8-thread pool clears the interpret-mode rendezvous
    cliff documented in __graft_entry__.dryrun_multichip (shards hold
    pool threads through collectives; 8-way meshes starve)."""
    import pytest

    from jax.sharding import Mesh

    from swarm_tpu.geom.world import make_tiled_rooms_blocks, walls_by_group

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (4-mesh + pool slack)")

    # device-major room layout: each device's agent block lives inside
    # its own 2-D tile (the static containment proof's requirement)
    size = 512
    walls_np, origins = make_tiled_rooms_blocks(2, 2, size)
    n_rooms = origins.shape[0]
    n_agents = 2 * n_rooms
    eng = EngineConfig(parity_mode=False, compute_frontiers=False,
                       raster_mode="beam", scan_rays=37,
                       raster_4way=False, use_pallas=False,
                       kernel_endpoints=False, endpoint_hits=True)
    cfg = SwarmConfig(n_agents=n_agents,
                      grid=GridConfig(size=size, origin_x=0.0,
                                      origin_y=0.0),
                      engine=eng)
    params = make_agent_params(n_agents, separation=2.0, cfg=cfg)
    i = np.arange(n_agents)
    room = i // 2
    params = params._replace(
        home_x=jnp.asarray(origins[room, 0] + np.where(i % 2, 5.5, 0.5),
                           jnp.float32),
        home_y=jnp.asarray(origins[room, 1] + np.where(i % 2, 3.5, 0.5),
                           jnp.float32),
        x_offset=jnp.zeros((n_agents,), jnp.float32))
    walls = walls_np
    wg = walls_by_group(walls_np)
    roa = jnp.asarray(room, jnp.int32)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("gr", "gc"))
    outs = {}
    for use_pallas in (False, True):
        c = cfg.replace(engine=dataclasses.replace(
            cfg.engine, use_pallas=use_pallas))
        step = make_sharded_sim_step(
            c, walls, params, mesh, donate=False, grid_sharding="tiles",
            walls_grouped=wg, room_of_agent=roa)
        st = shard_state(sim_init(c, params), mesh,
                         grid_tiles_sharded=True)
        with pltpu.force_tpu_interpret_mode():
            for _ in range(3):
                st, m = step(st)
        outs[use_pallas] = (np.asarray(st.srv.logodds), int(m.writes))
    lo_x, w_x = outs[False]
    lo_p, w_p = outs[True]
    assert w_p > 0
    diff = np.abs(lo_p - lo_x)
    # kernel polynomial atan2 vs exact arctan2: borderline bin cells only
    assert (diff > 1e-3).sum() <= 64, (diff > 1e-3).sum()
    assert 0.4 < w_p / max(w_x, 1) < 2.5, (w_p, w_x)
