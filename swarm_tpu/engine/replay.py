"""The mapping server as one jitted scan over a packet stream.

This replaces the reference's live loop (server_nodes/dual_bot_mapper.py
:796-1002): per packet it applies the agent separation offset (:851-852) and
the accumulated SLAM drift correction (:854-857), traces the four sensor
rays into the occupancy grid with the trust filter (:881-904), folds hits
and path into the territory AABBs, adds the pose to the loop-closure graph
(:907-919), and on the reference's 2 s / 3 s cadences snapshots zones
(:921-945) and frontier targets (:947-996).

The reference is event-driven on wall-clock arrival; a replay is defined by
packet order and packet timestamps, which makes the whole server a pure
`lax.scan` — deterministic, jittable, and the same code path the live UDP
front-end feeds frame batches into. Map + SLAM outputs are bit-comparable
to a sequential CPU oracle; zone/frontier cadences fire on packet-time
rather than frame-time (sub-frame granularity, noted divergence).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from swarm_tpu.engine.sim import writes_accumulate
from swarm_tpu.config import SwarmConfig
from swarm_tpu.coord.assign import greedy_assign
from swarm_tpu.coord.heartbeat import heartbeat_update
from swarm_tpu.coord.zones import ZoneState, zone_init, zone_observe, zones_for_agents
from swarm_tpu.ops.frontier import frontier_clusters
from swarm_tpu.ops.raster import RayBatch, parity_raster
from swarm_tpu.slam.closure import ClosureState, closure_add_pose, closure_init


class PacketStream(NamedTuple):
    """Time-ordered telemetry packets as arrays [T] (QuasarPacket v2 fields,
    dual_bot_mapper.py:41-42 / AgentFirmware_Bot1.ino:172-185)."""
    t: jnp.ndarray          # [T] seconds
    agent: jnp.ndarray      # [T] int32, 0-based
    x: jnp.ndarray          # [T] reported odometry
    y: jnp.ndarray
    yaw: jnp.ndarray        # [T] radians
    encoder: jnp.ndarray    # [T] int32
    v2v: jnp.ndarray        # [T] int32
    dist: jnp.ndarray       # [T, 4] metres (front, left, back, right)
    landmark: jnp.ndarray   # [T] int32
    valid: jnp.ndarray      # [T] bool (padding mask)


class ServerState(NamedTuple):
    grid: jnp.ndarray            # [S, S] int8 tri-state
    closure: ClosureState
    zone: ZoneState
    last_packet_t: jnp.ndarray   # [N]
    pkt_counts: jnp.ndarray      # [N] int32
    agent_xy: jnp.ndarray        # [N, 2] last corrected position
    agent_yaw: jnp.ndarray       # [N]
    zone_boxes: jnp.ndarray      # [N, 4] latest snapshot
    zone_active: jnp.ndarray     # [N] bool
    targets: jnp.ndarray         # [N, 2]
    has_target: jnp.ndarray      # [N] bool
    frontier_centroids: jnp.ndarray  # [K, 2]
    n_frontiers: jnp.ndarray     # [] int32
    last_zone_t: jnp.ndarray     # []
    last_target_t: jnp.ndarray   # []
    total_writes: jnp.ndarray    # [2] int32 (hi, lo) — engine.sim counter


class ReplayOutputs(NamedTuple):
    """Per-packet outputs — everything the reference logs to CSV / renders."""
    rx: jnp.ndarray          # corrected pose (telemetry.csv columns)
    ry: jnp.ndarray
    yaw: jnp.ndarray
    hits: jnp.ndarray        # [T, 4, 2] world hit points
    hit_valid: jnp.ndarray   # [T, 4]
    closed: jnp.ndarray      # [T] bool loop closure fired
    corr: jnp.ndarray        # [T, 2] closure correction
    online: jnp.ndarray      # [T, N] heartbeat snapshot
    writes: jnp.ndarray      # [T] grid cell writes


def server_init(cfg: SwarmConfig, t0: float = 0.0) -> ServerState:
    n = cfg.n_agents
    s = cfg.grid.size
    k = cfg.coord.max_frontiers
    return ServerState(
        grid=jnp.full((s, s), cfg.grid.unknown, jnp.int8),
        closure=closure_init(
            n, cfg.slam,
            scan_rays=(cfg.engine.scan_rays
                       if cfg.slam.closure_scanmatch else 0)),
        zone=zone_init(n),
        last_packet_t=jnp.zeros((n,), jnp.float32),
        pkt_counts=jnp.zeros((n,), jnp.int32),
        agent_xy=jnp.zeros((n, 2), jnp.float32),
        agent_yaw=jnp.zeros((n,), jnp.float32),
        zone_boxes=jnp.tile(jnp.array([999.0, 999.0, -999.0, -999.0],
                                      jnp.float32), (n, 1)),
        zone_active=jnp.zeros((n,), bool),
        targets=jnp.zeros((n, 2), jnp.float32),
        has_target=jnp.zeros((n,), bool),
        frontier_centroids=jnp.zeros((k, 2), jnp.float32),
        n_frontiers=jnp.zeros((), jnp.int32),
        last_zone_t=jnp.asarray(t0, jnp.float32),
        last_target_t=jnp.asarray(t0, jnp.float32),
        total_writes=jnp.zeros((2,), jnp.int32))


def ingest_packet(state: ServerState, pkt, cfg: SwarmConfig,
                  offsets, enable_targets: bool = False,
                  compute_frontiers: bool = False):
    """Process ONE packet — the body of the replay scan and of the live
    server's frame loop. pkt is a PacketStream row (scalars)."""
    sens = cfg.sensors
    t, agent, valid = pkt.t, pkt.agent, pkt.valid

    # separation offset (:851-852) + accumulated drift correction (:854-857)
    rx = pkt.x + offsets[agent] + state.closure.drift_dx[agent]
    ry = pkt.y + state.closure.drift_dy[agent]
    ryaw = pkt.yaw

    last_packet_t = state.last_packet_t.at[agent].set(
        jnp.where(valid, t, state.last_packet_t[agent]))
    pkt_counts = state.pkt_counts.at[agent].add(jnp.where(valid, 1, 0))
    agent_xy = state.agent_xy.at[agent].set(
        jnp.where(valid, jnp.stack([rx, ry]), state.agent_xy[agent]))
    agent_yaw = state.agent_yaw.at[agent].set(
        jnp.where(valid, ryaw, state.agent_yaw[agent]))

    # 4-ray projection with trust filter (:881-904)
    angles = ryaw + jnp.asarray(sens.angles, rx.dtype)
    hit_valid = (pkt.dist > sens.min_range) & (pkt.dist <= sens.max_range)
    rng = jnp.where(hit_valid, pkt.dist, sens.max_range)
    hx = rx + rng * jnp.cos(angles)
    hy = ry + rng * jnp.sin(angles)
    rays = RayBatch(
        ox=jnp.full((4,), rx), oy=jnp.full((4,), ry), hx=hx, hy=hy,
        hit_valid=hit_valid, active=jnp.full((4,), valid))
    grid, writes = parity_raster(state.grid, rays, cfg.grid)

    # territory AABB folds path point + valid hits (:930-940 running form)
    zone = zone_observe(
        state.zone, agent,
        jnp.concatenate([jnp.stack([rx]), hx]),
        jnp.concatenate([jnp.stack([ry]), hy]),
        jnp.concatenate([jnp.stack([valid]), hit_valid & valid]))

    # loop closure (:907-919)
    closure, closed, cdx, cdy = closure_add_pose(
        state.closure, rx, ry, agent, pkt.landmark, cfg.slam, valid=valid)

    online = heartbeat_update(last_packet_t, t, cfg.coord.heartbeat_timeout_s)

    # zone snapshot cadence (:921-945)
    do_zone = valid & ((t - state.last_zone_t) > cfg.coord.zone_interval_s)
    boxes, active = zones_for_agents(zone, agent_xy, online)
    zone_boxes = jnp.where(do_zone, boxes, state.zone_boxes)
    zone_active = jnp.where(do_zone, active, state.zone_active)
    last_zone_t = jnp.where(do_zone, t, state.last_zone_t)

    # frontier cadence (:947-996)
    do_target = valid & ((t - state.last_target_t) > cfg.coord.target_interval_s)
    if compute_frontiers:
        def recompute(_):
            cents, _, cnt = frontier_clusters(grid, cfg.grid, cfg.coord)
            if enable_targets:
                tgts, has = greedy_assign(agent_xy, online, cents, cnt,
                                          cfg.coord)
            else:
                tgts, has = state.targets, jnp.zeros_like(state.has_target)
            return cents, cnt, tgts, has

        def keep(_):
            return (state.frontier_centroids, state.n_frontiers,
                    state.targets, state.has_target)

        cents, n_fr, targets, has_target = jax.lax.cond(
            do_target, recompute, keep, None)
    else:
        cents, n_fr = state.frontier_centroids, state.n_frontiers
        targets, has_target = state.targets, state.has_target
    last_target_t = jnp.where(do_target, t, state.last_target_t)

    new_state = ServerState(
        grid=grid, closure=closure, zone=zone,
        last_packet_t=last_packet_t, pkt_counts=pkt_counts,
        agent_xy=agent_xy, agent_yaw=agent_yaw,
        zone_boxes=zone_boxes, zone_active=zone_active,
        targets=targets, has_target=has_target,
        frontier_centroids=cents, n_frontiers=n_fr,
        last_zone_t=last_zone_t, last_target_t=last_target_t,
        total_writes=writes_accumulate(state.total_writes,
                                       writes.astype(jnp.int32)))
    out = ReplayOutputs(
        rx=rx, ry=ry, yaw=ryaw,
        hits=jnp.stack([hx, hy], axis=-1), hit_valid=hit_valid & valid,
        closed=closed, corr=jnp.stack([cdx, cdy]),
        online=online, writes=writes.astype(jnp.int32))
    return new_state, out


def replay_session(stream: PacketStream, cfg: SwarmConfig,
                   offsets=None, t0=None, enable_targets: bool = False,
                   compute_frontiers: bool = False):
    """Replay a whole time-ordered packet stream. Returns
    (final ServerState, per-packet ReplayOutputs)."""
    n = cfg.n_agents
    if offsets is None:
        offsets = jnp.zeros((n,), jnp.float32)
    if t0 is None:
        t0 = stream.t[0]
    state = server_init(cfg, t0=0.0)._replace(
        last_zone_t=jnp.asarray(t0, jnp.float32),
        last_target_t=jnp.asarray(t0, jnp.float32))

    def step(st, pkt):
        return ingest_packet(st, pkt, cfg, offsets,
                             enable_targets=enable_targets,
                             compute_frontiers=compute_frontiers)

    return jax.lax.scan(step, state, stream)


def ingest_frame(state: ServerState, batch: PacketStream,
                 cfg: SwarmConfig, offsets,
                 enable_targets: bool = False,
                 compute_frontiers: bool = False,
                 scans=None):
    """THROUGHPUT serving mode: one FRAME of packets applied as a single
    fused computation instead of the per-packet lax.scan (`ingest_packet`
    — whose sequential body is the live server's cost at swarm packet
    rates: ~100 us/packet of pure serialization).

    Semantics vs the scan, all frame-coarse (frames are ~33 ms, the
    affected cadences are seconds):
      * the parity GRID stays ORDER-EXACT — parity_raster is sequence-
        aware across the whole frame's rays;
      * closure drift corrections apply from the NEXT frame on (the scan
        applies a mid-frame closure to later packets of the same frame);
      * closures/zone-snapshot/frontier cadences evaluate once per frame
        at the frame's latest timestamp;
      * closure matching uses each agent's LAST packet of the frame
        (closure_add_poses_batch needs distinct agents; the reference's
        >= 30-pose gap makes intra-frame matches impossible anyway).

    Returns (new_state, ReplayOutputs [B]) — per-packet outputs carry
    the frame-level closure/online results on each row.
    """
    from swarm_tpu.coord.zones import zone_observe_batch
    from swarm_tpu.slam.closure import closure_add_poses_batch

    sens = cfg.sensors
    n = cfg.n_agents
    t, agent, valid = batch.t, batch.agent, batch.valid
    b = t.shape[0]

    rx = batch.x + offsets[agent] + state.closure.drift_dx[agent]
    ry = batch.y + state.closure.drift_dy[agent]
    ryaw = batch.yaw

    # per-agent LAST valid packet of the frame
    pos = jnp.where(valid, jnp.arange(b, dtype=jnp.int32), -1)
    pos_last = jnp.full((n,), -1, jnp.int32).at[agent].max(pos,
                                                           mode="drop")
    has = pos_last >= 0
    pl = jnp.clip(pos_last, 0, b - 1)

    last_packet_t = jnp.where(has, t[pl], state.last_packet_t)
    pkt_counts = state.pkt_counts.at[agent].add(valid.astype(jnp.int32),
                                                mode="drop")
    agent_xy = jnp.where(has[:, None],
                         jnp.stack([rx[pl], ry[pl]], axis=-1),
                         state.agent_xy)
    agent_yaw = jnp.where(has, ryaw[pl], state.agent_yaw)

    # the whole frame's rays, order preserved (parity_raster resolves
    # same-cell writes by sequence id — identical to the scan)
    angles = ryaw[:, None] + jnp.asarray(sens.angles, rx.dtype)[None, :]
    hit_valid = (batch.dist > sens.min_range) & \
        (batch.dist <= sens.max_range)
    rng = jnp.where(hit_valid, batch.dist, sens.max_range)
    hx = rx[:, None] + rng * jnp.cos(angles)
    hy = ry[:, None] + rng * jnp.sin(angles)
    rays = RayBatch(
        ox=jnp.repeat(rx, 4), oy=jnp.repeat(ry, 4),
        hx=hx.reshape(-1), hy=hy.reshape(-1),
        hit_valid=hit_valid.reshape(-1),
        active=jnp.repeat(valid, 4))
    grid, writes = parity_raster(state.grid, rays, cfg.grid)

    zone = zone_observe_batch(
        state.zone,
        jnp.concatenate([agent, jnp.repeat(agent, 4)]),
        jnp.concatenate([rx, hx.reshape(-1)]),
        jnp.concatenate([ry, hy.reshape(-1)]),
        jnp.concatenate([valid, (hit_valid & valid[:, None]).reshape(-1)]))

    # scans: optional [N, R] LATEST sweep per agent (the live server's
    # scan payloads arrive as separate datagrams — slam/closurematch
    # needs them only at closure cadence, so a few-frame-stale sweep is
    # fine); enables the scan-matched closure log in serving mode
    closure, closed_a, cdx_a, cdy_a = closure_add_poses_batch(
        state.closure, rx[pl], ry[pl], jnp.arange(n, dtype=jnp.int32),
        batch.landmark[pl], cfg.slam, valid=has,
        yaws=agent_yaw, scans=scans, grid=cfg.grid, sens=cfg.sensors)

    t_frame = jnp.max(jnp.where(valid, t, -jnp.inf))
    t_frame = jnp.where(jnp.isfinite(t_frame), t_frame,
                        state.last_zone_t)
    online = heartbeat_update(last_packet_t, t_frame,
                              cfg.coord.heartbeat_timeout_s)

    any_valid = jnp.any(valid)
    do_zone = any_valid & ((t_frame - state.last_zone_t) >
                           cfg.coord.zone_interval_s)
    boxes, active = zones_for_agents(zone, agent_xy, online)
    zone_boxes = jnp.where(do_zone, boxes, state.zone_boxes)
    zone_active = jnp.where(do_zone, active, state.zone_active)
    last_zone_t = jnp.where(do_zone, t_frame, state.last_zone_t)

    do_target = any_valid & ((t_frame - state.last_target_t) >
                             cfg.coord.target_interval_s)
    if compute_frontiers:
        def recompute(_):
            cents, _, cnt = frontier_clusters(grid, cfg.grid, cfg.coord)
            if enable_targets:
                tgts, has_t = greedy_assign(agent_xy, online, cents, cnt,
                                            cfg.coord)
            else:
                tgts = state.targets
                has_t = jnp.zeros_like(state.has_target)
            return cents, cnt, tgts, has_t

        def keep(_):
            return (state.frontier_centroids, state.n_frontiers,
                    state.targets, state.has_target)

        cents, n_fr, targets, has_target = jax.lax.cond(
            do_target, recompute, keep, None)
    else:
        cents, n_fr = state.frontier_centroids, state.n_frontiers
        targets, has_target = state.targets, state.has_target
    last_target_t = jnp.where(do_target, t_frame, state.last_target_t)

    new_state = ServerState(
        grid=grid, closure=closure, zone=zone,
        last_packet_t=last_packet_t, pkt_counts=pkt_counts,
        agent_xy=agent_xy, agent_yaw=agent_yaw,
        zone_boxes=zone_boxes, zone_active=zone_active,
        targets=targets, has_target=has_target,
        frontier_centroids=cents, n_frontiers=n_fr,
        last_zone_t=last_zone_t, last_target_t=last_target_t,
        total_writes=writes_accumulate(state.total_writes,
                                       writes.astype(jnp.int32)))

    # per-packet outputs: frame-level closure results land on each
    # agent's LAST packet row; online broadcast per row
    closed_b = jnp.zeros((b,), bool).at[pl].set(
        closed_a & has, mode="drop")
    corr_b = jnp.zeros((b, 2), jnp.float32).at[pl].set(
        jnp.stack([cdx_a, cdy_a], axis=-1) *
        (closed_a & has)[:, None].astype(jnp.float32), mode="drop")
    out = ReplayOutputs(
        rx=rx, ry=ry, yaw=ryaw,
        hits=jnp.stack([hx, hy], axis=-1), hit_valid=hit_valid &
        valid[:, None],
        closed=closed_b, corr=corr_b,
        online=jnp.broadcast_to(online[None, :], (b, n)),
        writes=jnp.zeros((b,), jnp.int32).at[0].set(
            writes.astype(jnp.int32)))
    return new_state, out
