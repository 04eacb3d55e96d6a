"""On-chip fast-raster quality check (VERDICT r1 item 5): run the REAL
Pallas per-beam kernel (and optionally the group turbo tier) on the TPU
for a long closed-loop engine rollout and compare its map against the
XLA exact tier computed from the same trajectory.

Usage (TPU):
    PYTHONPATH=/root/.axon_site:/root/repo python tools/quality_onchip.py \
        [--steps 300] [--turbo]

Prints one line per tier: IoU of free space + wall p90 vs exact.
Known-good (r2, 300 steps, 61 rays, 4 agents): per-beam IoU ~0.97+,
wall p90 0-1; turbo (groups=8) IoU ~0.75-0.85, p90 <= 2.
"""
import argparse
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from swarm_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from __graft_entry__ import _cfg_and_world  # noqa: E402
from swarm_tpu.engine.sim import sim_init, sim_rollout  # noqa: E402
from swarm_tpu.ops.raster import tri_state_view  # noqa: E402


def run(patch, steps, use_pallas):
    cfg, walls, params, rooms = _cfg_and_world(
        4, frontiers=False, parity=False, raster_mode="beam",
        use_pallas=use_pallas, scan_rays=61, tiled=True)
    cfg = cfg.replace(engine=dataclasses.replace(cfg.engine, **patch))
    st = sim_init(cfg, params)
    t0 = time.time()
    final, _ = sim_rollout(st, steps, cfg, jnp.asarray(walls), params,
                           walls_grouped=rooms[0], room_of_agent=rooms[1])
    tri = np.asarray(tri_state_view(final.srv.logodds, cfg.grid))
    return tri, cfg, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--turbo", action="store_true",
                    help="also measure the group turbo tier")
    args = ap.parse_args()

    exact, cfg, te = run({"raster_4way": False}, args.steps,
                         use_pallas=False)
    print(f"exact tier: {te:.0f}s", flush=True)
    tiers = [("per-beam", {"raster_4way": False, "beam_groups": 0}),
             ("per-beam-pack8", {"raster_4way": False, "beam_groups": 0,
                                 "beam_pack8": True})]
    if args.turbo:
        tiers.append(("turbo-g8", {"raster_4way": False, "beam_groups": 8,
                                   "kernel_endpoints": True}))
    for name, patch in tiers:
        fast, _, tf = run(patch, args.steps, use_pallas=True)
        fe = exact == cfg.grid.free
        ff = fast == cfg.grid.free
        iou = (fe & ff).sum() / max((fe | ff).sum(), 1)
        occ_e = np.argwhere(exact == cfg.grid.occupied)
        occ_f = np.argwhere(fast == cfg.grid.occupied)
        d = np.abs(occ_f[:, None, :] - occ_e[None, :, :]).max(-1).min(-1)
        print(f"{name}: IoU {iou:.3f} wall-p90 "
              f"{np.quantile(d, 0.9):.1f} ({tf:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
