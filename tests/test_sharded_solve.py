"""Mesh-sharded batched pose-graph Gauss-Newton."""

import jax
import jax.numpy as jnp
import numpy as np

from swarm_tpu.parallel.mesh import make_mesh
from swarm_tpu.parallel.solve import make_sharded_solver, shard_graphs
from swarm_tpu.slam.posegraph import PoseGraph, graph_from_trajectory
from tests.test_slam_upgrades import noisy_loop_trajectory


def batch_graphs(n_agents, m=32):
    leaves = []
    for k in range(n_agents):
        true, noisy = noisy_loop_trajectory(m, seed=k)
        g = graph_from_trajectory(
            jnp.asarray(noisy), m,
            closures_i=jnp.asarray([m - 1]), closures_j=jnp.asarray([0]),
            closure_meas=jnp.zeros((1, 3)), n_closures=1,
            closure_weight=(50.0,) * 3)
        leaves.append(g)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *leaves)


def test_sharded_solver_matches_local():
    n = 8
    graphs = batch_graphs(n)
    mesh = make_mesh(4)
    solver = make_sharded_solver(mesh, iterations=8)
    out_sh, costs_sh, total_sh = solver(shard_graphs(graphs, mesh))

    # local reference
    from swarm_tpu.slam.posegraph import optimize_graphs_batch
    out_loc, costs_loc = jax.jit(
        lambda g: optimize_graphs_batch(g, iterations=8))(graphs)

    np.testing.assert_allclose(np.asarray(out_sh.poses),
                               np.asarray(out_loc.poses),
                               rtol=1e-4, atol=1e-4)
    # cost decreased for every agent
    c = np.asarray(costs_sh)
    assert (c[:, -1] < c[:, 0]).all()
    assert np.isfinite(float(total_sh))
