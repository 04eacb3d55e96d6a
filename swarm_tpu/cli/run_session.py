"""Session runner CLI — the `python dual_bot_mapper.py` /
`generate_fake_dual_session.py` entry points of the reference
(MULTI_AGENT_SETUP_GUIDE.md:63-77; simulation_tools/README.md:7-12) in one
tool. Produces a reference-schema session directory (telemetry.csv,
pointcloud.csv, slam_closures.csv, derived clouds) plus map.png and
metrics.json.

Presets:
  dual_bot           closed-loop fused engine, 2 agents, bedroom
  dual_bot_scripted  scripted scenario generator -> CSV -> replay engine
                     (the reference's configs[0] acceptance path)
  swarm              N-agent multi-room closed-loop run (--agents)

Usage: python -m swarm_tpu.cli.run_session --preset dual_bot --out /tmp/s
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _flatten_rollout_telemetry(ms, n_agents: int):
    """Stacked StepMetrics [T, ...] -> packet arrays ordered (step, agent),
    rows filtered to alive agents (an offline agent sends no packets)."""
    import numpy as np

    t = np.asarray(ms.t)                       # [T]
    T = len(t)
    alive = np.asarray(ms.alive).reshape(T, n_agents)

    def flat(a, extra=()):
        return np.asarray(a).reshape((T * n_agents,) + tuple(extra))

    mask = alive.reshape(-1)
    rows = dict(
        t=np.repeat(t, n_agents)[mask],
        agent=np.tile(np.arange(1, n_agents + 1), T)[mask],
        x=flat(ms.srv_x)[mask], y=flat(ms.srv_y)[mask],
        yaw=flat(ms.yaw_q)[mask],
        encoder=flat(ms.encoder)[mask], v2v=flat(ms.v2v)[mask],
        dist4=flat(ms.dist_m, (4,))[mask],
        landmark=flat(ms.landmark)[mask],
        hits=flat(ms.hits, (4, 2))[mask],
        hit_valid=flat(ms.hit_valid, (4,))[mask])
    return rows


def _write_events(out_dir: str, ms, n_agents: int) -> str:
    """Structured event stream (events.jsonl) — the reference's tagged
    console lines ([SLAM] LOOP CLOSURE, [HEARTBEAT] transitions,
    dual_bot_mapper.py:320-322, 811-812) as durable JSONL."""
    import json as _json

    import numpy as np

    t = np.asarray(ms.t)
    closures = np.asarray(ms.closures)
    online = np.asarray(ms.online)
    mission = np.asarray(ms.mission_done)
    path = os.path.join(out_dir, "events.jsonl")
    with open(path, "w") as f:
        prev_online = None
        prev_mission = 0
        for i in range(len(t)):
            if closures[i]:
                f.write(_json.dumps({
                    "t": round(float(t[i]), 3), "event": "loop_closure",
                    "count": int(closures[i])}) + "\n")
            if prev_online is not None and online[i] != prev_online:
                f.write(_json.dumps({
                    "t": round(float(t[i]), 3), "event": "heartbeat",
                    "online": int(online[i]), "agents": n_agents}) + "\n")
            if mission[i] != prev_mission:
                f.write(_json.dumps({
                    "t": round(float(t[i]), 3), "event": "mission_complete",
                    "done": int(mission[i])}) + "\n")
            prev_online = online[i]
            prev_mission = mission[i]
    return path


def _closures_from_state(closure):
    import numpy as np

    n = int(closure.cl_count)
    n = min(n, len(np.asarray(closure.cl_node)))
    return (np.asarray(closure.cl_lm_node)[:n],
            np.asarray(closure.cl_node)[:n],
            np.asarray(closure.cl_dx)[:n],
            np.asarray(closure.cl_dy)[:n])


def run_closed_loop(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from swarm_tpu.config import EngineConfig, SwarmConfig
    from swarm_tpu.engine.sim import (make_agent_params, sim_init,
                                     sim_rollout, total_writes_value)
    from swarm_tpu.geom.world import BEDROOM_WALLS
    from swarm_tpu.proto.csvio import write_session
    from swarm_tpu.render import render_map, save_png

    rooms = (None, None)
    if args.preset == "swarm":
        from __graft_entry__ import _cfg_and_world
        cfg, walls, params, rooms = _cfg_and_world(args.agents,
                                                   frontiers=False,
                                                   parity=False)
    else:
        cfg = SwarmConfig(n_agents=2, engine=EngineConfig(
            compute_frontiers=not args.no_frontiers))
        walls = BEDROOM_WALLS
        params = make_agent_params(2, separation=args.separation, cfg=cfg)

    key = jax.random.PRNGKey(args.seed)
    st = sim_init(cfg, params, key)
    if args.resume:
        from swarm_tpu.engine.checkpoint import load_pytree
        st = load_pytree(args.resume, st)
        print(f"[RESUME] from {args.resume} at t={float(st.t):.1f}s "
              f"step={int(st.step)}")
    t0 = time.time()
    final, ms = jax.jit(lambda s: sim_rollout(
        s, args.steps, cfg, jnp.asarray(walls), params,
        enable_targets=args.enable_targets,
        walls_grouped=rooms[0], room_of_agent=rooms[1]))(st)
    jax.block_until_ready(final.t)
    elapsed = time.time() - t0

    if args.checkpoint:
        from swarm_tpu.engine.checkpoint import save_pytree
        save_pytree(args.checkpoint, final)
        print(f"[CHECKPOINT] saved {args.checkpoint}")

    rows = _flatten_rollout_telemetry(ms, cfg.n_agents)
    write_session(args.out, rows["t"], rows["agent"], rows["x"], rows["y"],
                  rows["yaw"], rows["encoder"], rows["v2v"], rows["dist4"],
                  rows["landmark"], hits_xy=rows["hits"],
                  hit_valid=rows["hit_valid"],
                  closures=_closures_from_state(final.srv.closure))
    _write_events(args.out, ms, cfg.n_agents)

    grid = (final.srv.grid if cfg.engine.parity_mode else None)
    if grid is None:
        from swarm_tpu.ops.raster import tri_state_view
        grid = tri_state_view(final.srv.logodds, cfg.grid)
    img = render_map(
        grid, cfg.grid, scale=max(1, 1024 // cfg.grid.size),
        points_xy=rows["hits"].reshape(-1, 2),
        points_agent=np.repeat(rows["agent"] - 1, 4),
        points_valid=rows["hit_valid"].reshape(-1),
        paths_xy=np.stack([rows["x"], rows["y"]], -1),
        paths_agent=rows["agent"] - 1,
        poses=np.stack([np.asarray(ms.srv_x)[-1], np.asarray(ms.srv_y)[-1],
                        np.asarray(ms.yaw_q)[-1]], -1),
        zones=np.asarray(final.srv.zone_boxes),
        zones_active=np.asarray(final.srv.zone_active),
        frontiers=np.asarray(final.srv.frontier_centroids),
        n_frontiers=int(final.srv.n_frontiers))
    save_png(img, os.path.join(args.out, "map.png"))

    metrics = {
        "preset": args.preset, "agents": cfg.n_agents, "steps": args.steps,
        "elapsed_s": round(elapsed, 3),
        "steps_per_s": round(args.steps / elapsed, 2),
        "total_cell_writes": total_writes_value(final.srv.total_writes),
        "closures": int(np.asarray(ms.closures).sum()),
        "online_at_end": int(np.asarray(ms.online)[-1]),
        "mission_done": int(np.asarray(ms.mission_done)[-1]),
        "mean_pose_err_m": float(np.asarray(ms.pose_err)[-1]),
        "packets": int(len(rows["t"])),
    }
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics))


def run_scripted(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from swarm_tpu.config import SwarmConfig
    from swarm_tpu.engine.replay import replay_session
    from swarm_tpu.engine.sim import total_writes_value
    from swarm_tpu.proto.csvio import (load_session,
                                       packet_stream_from_telemetry,
                                       write_session)
    from swarm_tpu.render import render_map, save_png
    from swarm_tpu.sim.scenario import generate_dual_session

    cfg = SwarmConfig(n_agents=2)
    res = generate_dual_session(seed=args.seed, cfg=cfg)
    write_session(args.out, res.t, res.agent, res.x, res.y, res.yaw_q,
                  res.encoder, res.v2v, res.dist4, res.landmark)

    sess = load_session(args.out)
    stream = packet_stream_from_telemetry(sess)
    t0 = time.time()
    state, outs = jax.jit(lambda s: replay_session(
        s, cfg, offsets=jnp.zeros(2)))(stream)
    jax.block_until_ready(state.grid)
    elapsed = time.time() - t0

    img = render_map(
        state.grid, cfg.grid, scale=4,
        points_xy=np.asarray(outs.hits).reshape(-1, 2),
        points_agent=np.repeat(np.asarray(stream.agent), 4),
        points_valid=np.asarray(outs.hit_valid).reshape(-1),
        paths_xy=np.stack([np.asarray(outs.rx), np.asarray(outs.ry)], -1),
        paths_agent=np.asarray(stream.agent))
    save_png(img, os.path.join(args.out, "map.png"))

    refined_stats = None
    if args.optimize:
        from swarm_tpu.proto.csvio import load_session as _load
        from swarm_tpu.slam.refine import refine_session, reraster_session

        sess = _load(args.out)
        refined = refine_session(sess, cfg=cfg)
        grid_opt, _ = reraster_session(sess, refined, cfg)
        save_png(render_map(jnp.asarray(grid_opt), cfg.grid, scale=4),
                 os.path.join(args.out, "map_refined.png"))
        refined_stats = {
            a: len(r["closures"]) for a, r in refined.items()}

    metrics = {
        "preset": args.preset, "packets": int(len(res.t)),
        "replay_elapsed_s": round(elapsed, 3),
        "total_cell_writes": total_writes_value(state.total_writes),
        "closures": int(state.closure.cl_count),
        "refined_closures_per_agent": refined_stats,
    }
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="dual_bot",
                    choices=["dual_bot", "dual_bot_scripted", "swarm"])
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--agents", type=int, default=64, help="swarm preset")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--separation", type=float, default=5.0,
                    help="Bot2 x offset (dual_bot_mapper.py --separation)")
    ap.add_argument("--enable-targets", action="store_true",
                    help="enable the commented-out frontier TARG path "
                         "(dual_bot_mapper.py:959-996)")
    ap.add_argument("--optimize", action="store_true",
                    help="scripted preset: pose-graph-refine the session "
                         "and emit map_refined.png")
    ap.add_argument("--no-frontiers", action="store_true")
    ap.add_argument("--checkpoint", default=None,
                    help="save final SimState to this .npz")
    ap.add_argument("--resume", default=None,
                    help="load initial SimState from this .npz")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    os.makedirs(args.out, exist_ok=True)
    if args.preset == "dual_bot_scripted":
        run_scripted(args)
    else:
        run_closed_loop(args)


if __name__ == "__main__":
    main()
