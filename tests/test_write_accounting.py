"""Write-metric reconciliation (VERDICT r1 item 3).

The beam fast tier counts floor(db/res)-1 LINE-EQUIVALENT path cells per
beam (engine.sim._ingest_batched), but the Pallas kernel carves free space
from GROUP-MIN ranges — where beams in a group differ (corners, oblique
walls) the claimed count exceeds the evidence actually applied. These
tests measure the applied evidence (sum |delta| in unit updates, on a
fresh unclamped map) against the claimed counter and bound the gap, so the
headline throughput number's semantics stay pinned down.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from __graft_entry__ import _cfg_and_world
from swarm_tpu.engine.sim import make_sim_step, sim_init


def _measure_ratio(use_pallas: bool, steps_warm=2, steps_meas=4):
    cfg, walls, params, rooms = _cfg_and_world(
        8, frontiers=False, parity=False, raster_mode="beam",
        use_pallas=use_pallas, scan_rays=61, tiled=use_pallas,
        room_kernel=False)
    cfg = cfg.replace(engine=dataclasses.replace(
        cfg.engine, kernel_endpoints=False, raster_4way=False,
        beam_groups=8))
    walls = jnp.asarray(walls)
    step = make_sim_step(cfg, walls, params, donate=False,
                         walls_grouped=rooms[0], room_of_agent=rooms[1])
    state = sim_init(cfg, params)
    hit = cfg.grid.logodds_hit
    miss = abs(cfg.grid.logodds_miss)
    ratios = []
    for k in range(steps_warm + steps_meas):
        lo0 = state.srv.logodds
        state, m = step(state)
        if k < steps_warm:
            continue
        d = np.asarray(state.srv.logodds) - np.asarray(lo0)
        applied = (np.sum(np.maximum(-d, 0.0)) / miss +
                   np.sum(np.maximum(d, 0.0)) / hit)
        ratios.append(applied / max(int(m.writes), 1))
    return np.asarray(ratios)


def test_kernel_tier_claimed_vs_applied_bounded():
    """Pallas fast tier: group-min carving drops some claimed evidence —
    the gap must stay bounded (and the claim must never UNDER-count by
    more than endpoint/carve cancellation)."""
    with pltpu.force_tpu_interpret_mode():
        r = _measure_ratio(use_pallas=True)
    assert (r > 0.55).all(), r        # at most ~45% claimed-but-unapplied
    assert (r < 1.05).all(), r        # claim is an upper bound (+ slack)


def test_reference_tier_counts_painted_cells():
    """The XLA beam tier counts actually-painted cells, so applied must
    track the claim within same-cell cancellation slack."""
    r = _measure_ratio(use_pallas=False)
    assert (r > 0.9).all(), r
    assert (r < 1.02).all(), r
