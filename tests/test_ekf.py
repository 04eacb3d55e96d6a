import jax
import jax.numpy as jnp
import numpy as np

from swarm_tpu.config import EkfConfig
from swarm_tpu.models.ekf import (
    EkfState,
    ekf_init,
    ekf_pose,
    ekf_predict,
    ekf_quaternion_z_w,
    ekf_update,
)
from tests.oracle_mapper import oracle_ekf_predict, oracle_ekf_update

CFG = EkfConfig()


def test_predict_matches_cpp_oracle(rng):
    x = rng.normal(0, 1, 6)
    P = np.eye(6) * 0.5 + 0.01
    st = EkfState(x=jnp.asarray(x, jnp.float32),
                  P=jnp.asarray(P, jnp.float32),
                  last_t=jnp.asarray(10.0, jnp.float32))
    out = ekf_predict(st, 0.3, 10.05, CFG)
    xo, Po = oracle_ekf_predict(x, P, 0.3, 0.05, CFG.q_diag)
    np.testing.assert_allclose(np.asarray(out.x), xo, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.P), Po, rtol=1e-5, atol=1e-5)


def test_update_matches_cpp_oracle(rng):
    x = rng.normal(0, 1, 6)
    P = np.eye(6) * 0.7 + 0.02
    st = EkfState(x=jnp.asarray(x, jnp.float32),
                  P=jnp.asarray(P, jnp.float32),
                  last_t=jnp.asarray(0.0, jnp.float32))
    out = ekf_update(st, 0.25, -0.1, CFG)
    xo, Po = oracle_ekf_update(x, P, 0.25, -0.1, CFG.r_odom_diag)
    np.testing.assert_allclose(np.asarray(out.x), xo, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.P), Po, rtol=1e-5, atol=1e-5)


def test_dt_nonpositive_is_noop():
    st = ekf_init(x0=np.arange(6.0), t0=5.0)
    out = ekf_predict(st, 0.5, 5.0, CFG)   # dt == 0 -> guard (ekf.cpp:30)
    np.testing.assert_array_equal(np.asarray(out.x), np.asarray(st.x))
    np.testing.assert_array_equal(np.asarray(out.P), np.asarray(st.P))
    assert float(out.last_t) == 5.0


def test_filter_converges_on_constant_motion(rng):
    """Drive a simulated constant (v, omega) trajectory through
    predict/update; the velocity states must converge."""
    st = ekf_init(t0=0.0)
    v_true, w_true = 0.3, 0.1
    t = 0.0
    for i in range(200):
        t += 0.02
        st = ekf_predict(st, w_true + rng.normal(0, 0.01), t, CFG)
        st = ekf_update(st, v_true + rng.normal(0, 0.02),
                        w_true + rng.normal(0, 0.02), CFG)
    _, _, _, v, w = ekf_pose(st)
    assert abs(float(v) - v_true) < 0.05
    assert abs(float(w) - w_true) < 0.05


def test_vmapped_batch_matches_single(rng):
    n = 64
    xs = rng.normal(0, 1, (n, 6)).astype(np.float32)
    Ps = np.tile(np.eye(6, dtype=np.float32)[None], (n, 1, 1)) * 0.4
    ts = np.zeros(n, np.float32)
    batch = EkfState(x=jnp.asarray(xs), P=jnp.asarray(Ps), last_t=jnp.asarray(ts))
    omg = jnp.asarray(rng.normal(0, 0.5, n).astype(np.float32))
    out = jax.vmap(lambda s, w: ekf_predict(s, w, 0.1, CFG))(batch, omg)
    one = ekf_predict(
        EkfState(x=batch.x[3], P=batch.P[3], last_t=batch.last_t[3]),
        omg[3], 0.1, CFG)
    np.testing.assert_allclose(np.asarray(out.x[3]), np.asarray(one.x),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.P[3]), np.asarray(one.P),
                               rtol=1e-6)


def test_quaternion_output():
    st = ekf_init(x0=np.array([0, 0, np.pi / 2, 0, 0, 0]))
    z, w = ekf_quaternion_z_w(st)
    np.testing.assert_allclose(float(z), np.sin(np.pi / 4), rtol=1e-6)
    np.testing.assert_allclose(float(w), np.cos(np.pi / 4), rtol=1e-6)


def test_batch_matches_vmapped(rng):
    """The SoA swarm-batched EKF (unrolled sparse F P F^T, broadcasted
    update) agrees with vmap of the per-agent reference implementation —
    long-chain: 50 predict+update rounds."""
    from swarm_tpu.models.ekf import (ekf_predict_batch, ekf_step_batch,
                                      ekf_update_batch)
    n = 64
    xs = rng.normal(0, 1, (n, 6)).astype(np.float32)
    Ps = np.tile(np.eye(6, dtype=np.float32)[None], (n, 1, 1)) * 0.4
    st_b = EkfState(x=jnp.asarray(xs), P=jnp.asarray(Ps),
                    last_t=jnp.zeros((n,), jnp.float32))
    st_v = st_b
    for k in range(50):
        t = jnp.full((n,), 0.1 * (k + 1), jnp.float32)
        omg = jnp.asarray(rng.normal(0, 0.5, n).astype(np.float32))
        v = jnp.asarray(rng.normal(0.2, 0.1, n).astype(np.float32))
        st_b = ekf_step_batch(st_b, omg, v, t, CFG)
        st_v = jax.vmap(lambda s, w, tt: ekf_predict(s, w, tt, CFG))(
            st_v, omg, t)
        st_v = jax.vmap(lambda s, vv, w: ekf_update(s, vv, w, CFG))(
            st_v, v, omg)
    np.testing.assert_allclose(np.asarray(st_b.x), np.asarray(st_v.x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_b.P), np.asarray(st_v.P),
                               rtol=1e-4, atol=1e-6)
    # dt <= 0 guard: repeated timestamp is a no-op for predict
    same = ekf_predict_batch(st_b, jnp.zeros((n,)), st_b.last_t, CFG)
    np.testing.assert_array_equal(np.asarray(same.x), np.asarray(st_b.x))
    # update alone matches too
    ub = ekf_update_batch(st_b, jnp.full((n,), 0.3), jnp.zeros((n,)), CFG)
    uv = jax.vmap(lambda s: ekf_update(s, 0.3, 0.0, CFG))(st_b)
    np.testing.assert_allclose(np.asarray(ub.P), np.asarray(uv.P),
                               rtol=1e-5, atol=1e-7)
