"""Mesh-sharded pose-graph solving — BASELINE configs[4]: 1024-agent
swarm with pose-graph optimisation across the TPU mesh.

Per-agent trajectory graphs are independent solves (the 'EP-like fan-out',
SURVEY §2), so the decomposition is: shard the [N]-agent batch of graphs
over the `agents` mesh axis, run the batched dense Gauss-Newton
(slam/posegraph.py) locally on each shard — ZERO communication during the
solve — and only the final cost scalars cross the ICI for reporting.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from swarm_tpu.slam.posegraph import PoseGraph, gauss_newton


def make_sharded_solver(mesh, iterations: int = 10, damping: float = 1e-3):
    """Returns solve(graphs) for a PoseGraph pytree with leading [N] agent
    axis on every leaf, N divisible by the mesh size."""
    axis = mesh.axis_names[0]
    specs = PoseGraph(*([P(axis)] * len(PoseGraph._fields)))

    def body(graphs: PoseGraph):
        out, costs = jax.vmap(
            lambda g: gauss_newton(g, iterations, damping))(graphs)
        total = jax.lax.psum(jnp.sum(costs[:, -1]), axis)
        return out, costs, total

    f = shard_map(body, mesh=mesh, in_specs=(specs,),
                  out_specs=(specs, P(axis), P()), check_vma=False)
    return jax.jit(f)


def shard_graphs(graphs: PoseGraph, mesh) -> PoseGraph:
    specs = PoseGraph(*([P(mesh.axis_names[0])] * len(PoseGraph._fields)))
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        graphs, specs)
