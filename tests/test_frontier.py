import jax.numpy as jnp
import numpy as np

from swarm_tpu.config import CoordConfig, GridConfig
from swarm_tpu.ops.frontier import frontier_clusters, frontier_mask, label_components
from tests.oracle_mapper import OracleGrid

CFG = GridConfig()


def _random_grid(rng):
    g = OracleGrid()
    for _ in range(120):
        rx, ry = rng.uniform(-2, 4), rng.uniform(-1.5, 1.5)
        yaw = rng.uniform(-np.pi, np.pi)
        dists = rng.uniform(0.0, 1.6, 4)
        g.ingest_packet(rx, ry, yaw, list(dists))
    return g


def test_frontier_mask_matches_oracle(rng):
    g = _random_grid(rng)
    mask = np.asarray(frontier_mask(jnp.asarray(g.grid), CFG))
    want = np.zeros_like(mask)
    for (x, y) in g.frontiers():
        want[y, x] = True
    np.testing.assert_array_equal(mask, want)


def test_clusters_match_oracle(rng):
    g = _random_grid(rng)
    cells = g.frontiers()
    oracle_clusters = g.cluster(cells)

    cents, sizes, count = frontier_clusters(
        jnp.asarray(g.grid), CFG, CoordConfig(max_frontiers=1024))
    count = int(count)
    assert count == len(oracle_clusters)
    assert count > 0, "no clusters formed — weak test"

    # sizes + centroids, in discovery order
    want_sizes = [len(c) for c in oracle_clusters]
    np.testing.assert_array_equal(np.asarray(sizes)[:count], want_sizes)
    want_cents = []
    for c in oracle_clusters:
        ax = sum(p[0] for p in c) / len(c)
        ay = sum(p[1] for p in c) / len(c)
        want_cents.append((CFG.origin_x + (ax + 0.5) * CFG.resolution,
                           CFG.origin_y + (ay + 0.5) * CFG.resolution))
    np.testing.assert_allclose(np.asarray(cents)[:count], want_cents,
                               rtol=1e-5, atol=1e-5)


def test_label_components_simple():
    mask = jnp.zeros((16, 16), bool)
    mask = mask.at[2, 2:5].set(True)        # component A: 3 cells
    mask = mask.at[3, 4].set(True)          # touches A -> same component
    mask = mask.at[10, 10].set(True)        # isolated singleton
    lbl = np.asarray(label_components(mask))
    a = lbl[2, 2]
    assert lbl[2, 3] == a and lbl[2, 4] == a and lbl[3, 4] == a
    assert lbl[10, 10] != a and lbl[10, 10] < 2 ** 30
    assert (lbl[np.asarray(~mask)] >= 2 ** 30).all()
