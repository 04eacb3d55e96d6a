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

    Engine-level check on the rows decomposition (4 devices). The tiles
    decomposition is covered by transitivity: tiles-XLA == replicated
    (tests/test_sharded_tiles.py) and the banded/tiled window kernel is
    BIT-EXACT vs the XLA tier on identical windows
    (tests/test_beam_raster.py::test_banded_window_kernel_bit_exact) —
    running the Mosaic interpreter inside an 8-device shard_map with
    ppermute deadlocks in the interpreter's buffer io_callbacks (an
    interpret-mode limitation; real-TPU lowering has no such layer)."""
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
