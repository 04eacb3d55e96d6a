"""Per-component step profiler: times each piece of the fused sim_step
standalone on the current backend, ranking where the non-raster remainder
goes at swarm scale.

Axon gotcha: the tunnelled TPU backend skips unfetched executions and
`block_until_ready` does not sync — every timed iteration pulls one scalar
to host.

Usage: python tools/profile_step.py [--agents 1024] [--iters 30]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=30):
    out = fn(*args)
    jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0].item()   # compile+sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0].item()
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt * 1e3:8.3f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from __graft_entry__ import _cfg_and_world
    from swarm_tpu.engine.sim import make_agent_params, sim_init
    from swarm_tpu.models.scan import scan_angles, sense_scan
    from swarm_tpu.models.sensors import sense_4way
    from swarm_tpu.models.ekf import ekf_predict, ekf_update
    from swarm_tpu.models.odometry import drift_integrate, encoder_emit
    from swarm_tpu.models import nav as navm
    from swarm_tpu.slam.closure import closure_add_poses_batch
    from swarm_tpu.coord.zones import zone_observe_batch

    n = args.agents
    cfg, walls, params, rooms = _cfg_and_world(
        n, frontiers=False, parity=False, raster_mode="beam",
        use_pallas=True, scan_rays=181, tiled=True)
    import dataclasses
    cfg = cfg.replace(engine=dataclasses.replace(
        cfg.engine, beam_groups=8, kernel_endpoints=True, raster_4way=False))
    state = sim_init(cfg, params)
    walls_grouped, room_of_agent = rooms
    walls_agent = walls_grouped[room_of_agent]
    key = jax.random.PRNGKey(0)
    ks = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(n, dtype=jnp.uint32))
    pose = state.pose_true
    print(f"platform={jax.devices()[0].platform} agents={n} "
          f"grid={cfg.grid.size}")

    timeit("rng fold_in x3", jax.jit(lambda k: tuple(
        jax.vmap(lambda kk: jax.random.fold_in(kk, i))(
            jax.vmap(lambda ii: jax.random.fold_in(k, ii))(
                jnp.arange(n, dtype=jnp.uint32)))
        for i in range(3))), key, iters=args.iters)

    timeit("sense_4way", jax.jit(lambda k, p, w: jax.vmap(
        lambda kk, pp, ww: sense_4way(kk, pp, ww, cfg.sensors))(k, p, w)),
        ks, pose, walls_agent, iters=args.iters)

    f_scan = jax.jit(lambda k, p, w: jax.vmap(
        lambda kk, pp, ww: sense_scan(kk, pp, ww, 181, cfg.sensors))(k, p, w))
    timeit("sense_scan 181", f_scan, ks, pose, walls_agent, iters=args.iters)
    scan_dist = f_scan(ks, pose, walls_agent)
    dist4 = jnp.full((n, 4), 1.0)

    # scan-beam world projection (the trig block inside _ingest_batched)
    def proj(ryaw, rx, ry, sd):
        sa = ryaw[:, None] + scan_angles(181, rx.dtype)[None, :]
        sv = (sd > cfg.sensors.min_range) & (sd <= cfg.sensors.max_range)
        sr = jnp.where(sv, sd, cfg.sensors.max_range)
        return rx[:, None] + sr * jnp.cos(sa), ry[:, None] + sr * jnp.sin(sa)
    timeit("scan projection trig", jax.jit(proj),
           pose[:, 2], pose[:, 0], pose[:, 1], scan_dist, iters=args.iters)

    lm = jnp.zeros((n,), jnp.int32).at[::7].set(2)
    agents_ix = jnp.arange(n, dtype=jnp.int32)
    alive = jnp.ones((n,), bool)
    timeit("closure batch (L=%d)" % cfg.slam.landmark_capacity,
           jax.jit(lambda cl, x, y: closure_add_poses_batch(
               cl, x, y, agents_ix, lm, cfg.slam, valid=alive)),
           state.srv.closure, pose[:, 0], pose[:, 1], iters=args.iters)

    navp = navm.NavParams(wall_side=params.wall_side,
                          motor_pwm=params.motor_pwm,
                          return_style=params.return_style,
                          home_x=params.home_x, home_y=params.home_y)
    zb = jnp.zeros((n, 4))
    hz = jnp.zeros((n,), bool)
    timeit("nav_step", jax.jit(lambda nv, d, p: navm.nav_step(
        nv, navp, d, p, jnp.zeros((n,)), zb, hz, 0.4, cfg.nav)),
        state.nav, dist4, pose, iters=args.iters)

    timeit("ekf predict+update", jax.jit(lambda e, w, v: jax.vmap(
        lambda s, ww, vv: ekf_update(
            ekf_predict(s, ww, 1.0, cfg.ekf), vv, ww, cfg.ekf))(e, w, v)),
        state.ekf, jnp.zeros((n,)), jnp.zeros((n,)), iters=args.iters)

    timeit("drift+encoder", jax.jit(lambda k, o: jax.vmap(
        lambda kk, oo, d, r, ts, yb: drift_integrate(
            kk, oo, d, r, ts, yb, cfg.noise))(
        k, o, jnp.full((n,), 0.07), jnp.zeros((n,)),
        params.trans_scale, params.yaw_bias_per_m)),
        ks, state.odom, iters=args.iters)

    def v2v_fn(p):
        txy = p[:, :2]
        d2 = jnp.sum((txy[:, None, :] - txy[None, :, :]) ** 2, -1)
        d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
        return jnp.sqrt(jnp.min(d2, 1))
    timeit("v2v O(N^2)", jax.jit(v2v_fn), pose, iters=args.iters)

    hx = pose[:, 0:1] + scan_dist * 0.0
    timeit("zone AABB fold", jax.jit(lambda z, x, y: zone_observe_batch(
        z, jnp.concatenate([agents_ix, jnp.repeat(agents_ix, 4)]),
        jnp.concatenate([x, jnp.repeat(x, 4)]),
        jnp.concatenate([y, jnp.repeat(y, 4)]),
        jnp.ones((5 * n,), bool))),
        state.srv.zone, pose[:, 0], pose[:, 1], iters=args.iters)

    # collision-clamp cast (1 ray/agent)
    from swarm_tpu.geom.world import cast_rays
    timeit("collision cast", jax.jit(lambda p, w: jax.vmap(
        lambda pp, ww: cast_rays(pp[:2], pp[2], ww))(p, w)),
        pose, walls_agent, iters=args.iters)

    # the raster fast path for scale
    from swarm_tpu.ops.beam_raster import BeamSpec, beams_from_scan
    from swarm_tpu.ops.beam_raster_pallas import free_raster_pallas
    if jax.devices()[0].platform == "tpu":
        spec = BeamSpec.scan(181)
        db, tb = beams_from_scan(scan_dist, cfg.sensors.max_range,
                                 cfg.sensors.min_range)
        axy = pose[:, :2]
        timeit("raster kernel (beam fast)", jax.jit(
            lambda lo, a, yw, d, t: free_raster_pallas(
                lo, a, yw, d, alive, spec, cfg.grid, n_groups=8, trusted=t)),
            state.srv.logodds, axy, pose[:, 2], db, tb, iters=args.iters)


if __name__ == "__main__":
    main()
