"""Greedy frontier-to-agent assignment.

The reference algorithm exists but is commented out on both ends
(server: dual_bot_mapper.py:959-996; firmware TARG handler:
AgentFirmware_Bot1.ino:126-139). Per SURVEY §7 ("reference quirks") it is
implemented here behind the engine's `enable_targets` flag: greedy
nearest-unused centroid per online agent, in agent order, rejecting
centroids within FRONTIER_SEPARATION of an already-assigned target.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from swarm_tpu.config import CoordConfig


def greedy_assign(agent_xy, online, centroids, n_centroids,
                  cfg: CoordConfig = CoordConfig(), room_boxes=None):
    """agent_xy: [N, 2]; online: [N]; centroids: [K, 2]; n_centroids: int32.
    Returns (targets [N, 2], has_target [N] bool).

    room_boxes [N, 4] (x0, y0, x1, y1), optional: restrict each agent's
    candidates to centroids inside its own box. The reference's 2-bot
    world is one shared room so every frontier is reachable by straight
    drive (GO_TO_TARGET has no path planner, ino:556-605); in multi-room
    swarm worlds an agent assigned a frontier in ANOTHER closed room
    drives at a wall forever — containment is the reachability test."""
    n = agent_xy.shape[0]
    k = centroids.shape[0]
    exists = jnp.arange(k) < n_centroids
    if room_boxes is not None:
        pad = 1e-3
        inside = ((centroids[None, :, 0] >= room_boxes[:, None, 0] - pad) &
                  (centroids[None, :, 0] <= room_boxes[:, None, 2] + pad) &
                  (centroids[None, :, 1] >= room_boxes[:, None, 1] - pad) &
                  (centroids[None, :, 1] <= room_boxes[:, None, 3] + pad))

    def per_agent(carry, i):
        used, tgts, has = carry
        ax = agent_xy[i]
        # separation check vs already-assigned targets (ref :976-983)
        sep2 = jnp.sum((centroids[:, None, :] - tgts[None, :, :]) ** 2, -1)
        too_close = jnp.any((sep2 < cfg.frontier_separation_m ** 2) &
                            has[None, :], axis=1)
        cand = exists & ~used & ~too_close
        if room_boxes is not None:
            cand = cand & inside[i]
        d2 = jnp.sum((centroids - ax[None, :]) ** 2, axis=-1)
        d2 = jnp.where(cand, d2, jnp.inf)
        best = jnp.argmin(d2)
        ok = online[i] & jnp.any(cand)
        used = used.at[best].set(used[best] | ok)
        tgts = tgts.at[i].set(jnp.where(ok, centroids[best], tgts[i]))
        has = has.at[i].set(ok)
        return (used, tgts, has), None

    init = (jnp.zeros((k,), bool), jnp.zeros((n, 2), centroids.dtype),
            jnp.zeros((n,), bool))
    (used, tgts, has), _ = jax.lax.scan(per_agent, init, jnp.arange(n))
    return tgts, has
