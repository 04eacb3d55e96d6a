"""Native C++ oracle vs the batched JAX kernels: EKF to float tolerance,
Bresenham cell-exact, update_ray grid-bit-equal, closure decisions equal."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swarm_tpu import native
from swarm_tpu.config import EkfConfig, GridConfig, SlamConfig
from swarm_tpu.models.ekf import ekf_init, ekf_predict, ekf_update
from swarm_tpu.ops.bresenham import bresenham_cells
from swarm_tpu.ops.raster import RayBatch, parity_raster
from swarm_tpu.slam.closure import closure_add_pose, closure_init


pytestmark = pytest.mark.skipif(
    not __import__("shutil").which("g++"), reason="no g++ toolchain")


def test_ekf_matches_jax():
    cfg = EkfConfig()
    oracle = native.EkfOracle(cfg.q_diag, cfg.r_odom_diag)
    st = ekf_init()
    rng = np.random.default_rng(3)
    t = 0.0
    for _ in range(50):
        t += float(rng.uniform(0.05, 0.2))
        omega = float(rng.normal(0, 0.5))
        v = float(rng.uniform(0, 0.3))
        oracle.predict(omega, t)
        st = ekf_predict(st, omega, t, cfg)
        oracle.update(v, omega)
        st = ekf_update(st, v, omega, cfg)
    np.testing.assert_allclose(np.asarray(st.x), oracle.x,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st.P), oracle.P,
                               rtol=1e-3, atol=1e-5)


def test_ekf_dt_guard():
    cfg = EkfConfig()
    oracle = native.EkfOracle(cfg.q_diag, cfg.r_odom_diag)
    oracle.predict(0.3, 1.0)
    x1 = oracle.x.copy()
    oracle.predict(0.9, 0.5)       # dt < 0: no-op (ekf.cpp:30)
    np.testing.assert_array_equal(oracle.x, x1)


@pytest.mark.parametrize("seg", [(0, 0, 10, 3), (5, 5, -7, 2), (3, 3, 3, 3),
                                 (0, 0, 0, 9), (9, 1, 0, 0)])
def test_bresenham_cell_exact(seg):
    ref = native.bresenham(*seg)
    cx, cy, valid, _ = bresenham_cells(
        jnp.asarray([seg[0]]), jnp.asarray([seg[1]]),
        jnp.asarray([seg[2]]), jnp.asarray([seg[3]]), k_max=32)
    got = np.stack([np.asarray(cx[0])[np.asarray(valid[0])],
                    np.asarray(cy[0])[np.asarray(valid[0])]], -1)
    np.testing.assert_array_equal(got, ref)


def test_update_ray_grid_bit_equal():
    cfg = GridConfig()
    rng = np.random.default_rng(11)
    grid_c = np.full((cfg.size, cfg.size), -1, np.int8)
    grid_j = jnp.full((cfg.size, cfg.size), -1, jnp.int8)

    for _ in range(100):
        rx, ry = rng.uniform(-1, 1, 2)
        ang = rng.uniform(-np.pi, np.pi)
        d = rng.uniform(0.1, 1.2)
        wx, wy = rx + d * np.cos(ang), ry + d * np.sin(ang)
        hit = bool(rng.random() < 0.7)
        native.update_ray(grid_c, cfg.resolution, cfg.origin_x, cfg.origin_y,
                          rx, ry, wx, wy, hit)
        rays = RayBatch(ox=jnp.asarray([rx], jnp.float32),
                        oy=jnp.asarray([ry], jnp.float32),
                        hx=jnp.asarray([wx], jnp.float32),
                        hy=jnp.asarray([wy], jnp.float32),
                        hit_valid=jnp.asarray([hit]),
                        active=jnp.asarray([True]))
        grid_j, _ = parity_raster(grid_j, rays, cfg)
    np.testing.assert_array_equal(np.asarray(grid_j), grid_c)


def test_closure_decisions_match():
    slam = SlamConfig()
    rng = np.random.default_rng(5)
    st = closure_init(1, slam)

    lm_x, lm_y, lm_t, lm_n = [], [], [], []
    last_closure = -slam.min_poses_between
    for i in range(300):
        x, y = rng.uniform(0, 3, 2)
        lm = int(rng.integers(0, 6)) if rng.random() < 0.4 else 0
        slot, dx, dy = native.closure_check(
            np.asarray(lm_x, np.float32), np.asarray(lm_y, np.float32),
            np.asarray(lm_t, np.int32), np.asarray(lm_n, np.int32),
            float(x), float(y), lm, i, last_closure,
            slam.min_poses_between, slam.closure_radius_m,
            slam.closure_correction)
        st, closed, jdx, jdy = closure_add_pose(
            st, jnp.float32(x), jnp.float32(y), jnp.int32(0),
            jnp.int32(lm), slam)
        assert bool(closed) == (slot >= 0), f"step {i}"
        if slot >= 0:
            np.testing.assert_allclose([float(jdx), float(jdy)], [dx, dy],
                                       atol=1e-5)
            last_closure = i
        if lm != 0:
            lm_x.append(x)
            lm_y.append(y)
            lm_t.append(lm)
            lm_n.append(i)
