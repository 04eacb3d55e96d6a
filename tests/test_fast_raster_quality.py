"""Map-quality guard for the fast raster tiers: the kernel-endpoint and
group-min approximations must produce the same map STRUCTURE as the exact
beam model on a real closed-loop run (walls in place, interior carved)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from __graft_entry__ import _cfg_and_world
from swarm_tpu.engine.sim import sim_init, sim_rollout
from swarm_tpu.ops.raster import tri_state_view


def _run(patch, steps=60):
    cfg, walls, params, rooms = _cfg_and_world(
        4, frontiers=False, parity=False, raster_mode="beam",
        use_pallas=True, scan_rays=61, tiled=True)
    cfg = cfg.replace(engine=dataclasses.replace(cfg.engine, **patch))
    st = sim_init(cfg, params)
    with pltpu.force_tpu_interpret_mode():
        final, _ = sim_rollout(st, steps, cfg, jnp.asarray(walls), params,
                               walls_grouped=rooms[0],
                               room_of_agent=rooms[1])
    return np.asarray(tri_state_view(final.srv.logodds, cfg.grid)), cfg


def test_kernel_endpoints_structurally_match_exact():
    exact, cfg = _run({"raster_4way": False, "endpoint_hits": True,
                       "kernel_endpoints": False})
    fast, _ = _run({"raster_4way": False, "kernel_endpoints": True,
                    "beam_groups": 8})

    free_e = exact == cfg.grid.free
    free_f = fast == cfg.grid.free
    inter = (free_e & free_f).sum()
    union = (free_e | free_f).sum()
    assert inter / max(union, 1) > 0.7, (inter, union)

    occ_e = np.argwhere(exact == cfg.grid.occupied)
    occ_f = np.argwhere(fast == cfg.grid.occupied)
    assert len(occ_f) > 10 and len(occ_e) > 10
    # every fast wall cell within 2 cells of an exact wall cell
    d = np.abs(occ_f[:, None, :] - occ_e[None, :, :]).max(-1).min(-1)
    assert np.quantile(d, 0.9) <= 2.0, np.quantile(d, 0.9)
