"""Roofline context for the raster kernel (VERDICT r3 item 5).

Quoted spec-sheet peaks are unverifiable through this tunnel, so both
roofline ceilings are MEASURED on the attached chip:

  * streaming HBM bandwidth — best-case read+write GB/s of a jitted
    elementwise add over an array far larger than VMEM (the same
    access pattern as the kernel's window DMAs);
  * VPU elementwise throughput — a jit'd chain of fused
    compare+select+add passes over a VMEM-resident block, the op mix
    that dominates the kernel (the hexadecet gather is pure selects).

Against those ceilings the tool places the deployable per-beam window
kernel (ops/beam_raster_pallas._free_kernel) using its measured
per-launch time and an analytic per-cell vector-op count derived from
the kernel structure (see _KERNEL_OPS_PER_CELL below).

Usage: python tools/roofline.py [--agents 1024]
Emits one JSON blob; prose summary goes to BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from swarm_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
import numpy as np


# Analytic per-cell vector-op count of the per-beam free kernel
# (_free_kernel, per_beam=True, dense fan, in-kernel endpoints), counted
# from the kernel body:
#   addressing (iota/offsets/dx/dy/r2/rsqrt/r)            ~12
#   atan2 polynomial + wrap + beam index + fan test       ~28
#   hexadecet packed gather: 181 beams -> 91 pairs ->
#     ceil(91/8)=12 octet sweeps x 9 selects + setup/unpack ~117
#   crossing count + free/ring evidence + applied counter ~21
#   accumulate + clamp + store cast                       ~4
_KERNEL_OPS_PER_CELL = 182
_GATHER_OPS_PER_CELL = 117


_BASE = {"t": 0.0}


def _chain_time(body, carry0, K, reps=3):
    """Time K chained `body(carry) -> carry` iterations inside ONE jitted
    lax.scan, fetched as a single scalar — the tunnelled backend costs
    ~30 ms of host RTT per fetched execution (see tools/profile_step.py),
    so per-op time must be amortized over the chain and the empty-scan
    baseline subtracted. Returns seconds per iteration."""
    def scanned(c0):
        def f(c, _):
            return body(c), ()
        c, _ = jax.lax.scan(f, c0, None, length=K)
        return sum(jnp.sum(l.astype(jnp.float32)) * 1e-9
                   for l in jax.tree_util.tree_leaves(c))
    fn = jax.jit(scanned)
    fn(carry0).item()                       # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(carry0).item()
        best = min(best, time.perf_counter() - t0)
    return max(best - _BASE["t"], 1e-9) / K


def _measure_base():
    _BASE["t"] = 0.0
    _BASE["t"] = _chain_time(lambda c: c + 1.0, jnp.zeros(()), 64) * 64


def measure_hbm_bw():
    """Streaming read+write GB/s: carry = carry * a over 256 MB (>> VMEM),
    chained 64x in one scan — each iteration reads + writes the array
    (~35 ms of traffic per fetch, >> the tunnel RTT jitter)."""
    n = 64 * 1024 * 1024                     # 256 MB f32
    x = jnp.full((n,), 1.0, jnp.float32)
    t = _chain_time(lambda v: v * 0.9999999, x, 64)
    return 2 * n * 4 / t / 1e9, t


def measure_vpu(chain=1024):
    """Elementwise f32 op/s on a VMEM-resident [1024, 1024] block: each
    chained iteration applies `chain` compare/select/add/mul ops (the
    kernel's dominant mix — the hexadecet gather is pure selects); each
    round depends on the previous, so nothing folds. ~30 ms of vector
    work per fetch at the expected few-Tops ceiling."""
    shape = (1024, 1024)
    x = jnp.linspace(0.0, 1.0, shape[0] * shape[1],
                     dtype=jnp.float32).reshape(shape)

    def body(v):
        for k in range(chain // 4):
            m = v > 0.5
            v = jnp.where(m, v * 0.99999, v + 1e-6)
        return v

    t = _chain_time(body, x, 128)
    total_ops = shape[0] * shape[1] * (chain // 4) * 4
    return total_ops / t / 1e12, t


def measure_kernel(agents):
    """Per-launch time of the deployable per-beam window kernel at the
    headline shapes (same call as tools/profile_step.py's
    'raster window kernel per-beam' row, without the scan harness)."""
    from __graft_entry__ import _cfg_and_world
    from swarm_tpu.ops.beam_raster import (BeamSpec, beams_from_scan,
                                           reach_cells)
    from swarm_tpu.ops.beam_raster_pallas import free_raster_pallas
    cfg, walls, params, rooms = _cfg_and_world(
        agents, frontiers=False, parity=False, raster_mode="beam",
        use_pallas=True, scan_rays=181, tiled=True)
    spec = BeamSpec.scan(181)
    reach = reach_cells(cfg)
    n = agents
    key = jax.random.PRNGKey(0)
    pose = jax.random.uniform(key, (n, 3), jnp.float32, 1.0, 7.0)
    sd = jnp.full((n, 181), 1.0)
    db, tb = beams_from_scan(sd, cfg.sensors.max_range,
                             cfg.sensors.min_range)
    alive = jnp.ones((n,), bool)
    lo = jnp.zeros((cfg.grid.size, cfg.grid.size), jnp.float32)

    def launch(grid):
        # the kernel aliases + writes the grid, so the carry evolves every
        # iteration — no perturbation needed, the chain times the bare
        # kernel launch
        return free_raster_pallas(grid, pose[:, :2], pose[:, 2],
                                  db, alive, spec, cfg.grid,
                                  n_groups=spec.n_beams, trusted=tb,
                                  reach=reach)[0]

    t = _chain_time(launch, lo, 128)
    from swarm_tpu.ops.beam_raster import patch_dims
    rows, cols = patch_dims(cfg.grid.size, reach)
    return t, rows, cols, cfg.grid.size


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", type=int, default=1024)
    args = ap.parse_args()
    plat = jax.devices()[0].platform
    print(f"platform={plat} device={jax.devices()[0]}", file=sys.stderr)

    _measure_base()
    bw, t_bw = measure_hbm_bw()
    vpu, t_vpu = measure_vpu()
    t_k, rows, cols, gsize = measure_kernel(args.agents)

    n = args.agents
    cells = n * rows * cols                       # window cells / launch
    kernel_bytes = cells * 4 * 2                  # window in + out, f32
    kernel_ops = cells * _KERNEL_OPS_PER_CELL
    out = {
        "platform": plat,
        "measured_hbm_stream_gbps": round(bw, 1),
        "measured_vpu_tops_f32": round(vpu, 2),
        "kernel_ms": round(t_k * 1e3, 3),
        "window": [rows, cols],
        "window_cells_per_launch": cells,
        "kernel_hbm_gbps": round(kernel_bytes / t_k / 1e9, 1),
        "kernel_hbm_frac": round(kernel_bytes / t_k / 1e9 / bw, 3),
        "kernel_vpu_tops": round(kernel_ops / t_k / 1e12, 2),
        "kernel_vpu_frac": round(kernel_ops / t_k / 1e12 / vpu, 3),
        "ops_per_cell": _KERNEL_OPS_PER_CELL,
        "gather_ops_per_cell": _GATHER_OPS_PER_CELL,
        "grid_size": gsize,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
