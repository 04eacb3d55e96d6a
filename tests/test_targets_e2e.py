"""End-to-end frontier target loop: detection -> greedy assignment ->
TARG delivery -> GO_TO_TARGET (the reference's disabled path,
dual_bot_mapper.py:959-996 + AgentFirmware_Bot1.ino:126-139, behind the
enable_targets flag)."""

import jax
import jax.numpy as jnp
import numpy as np

from swarm_tpu.config import SwarmConfig
from swarm_tpu.engine.sim import make_agent_params, sim_init, sim_rollout
from swarm_tpu.geom.world import BEDROOM_WALLS
from swarm_tpu.models import nav as navm


def test_targets_assigned_and_pursued():
    cfg = SwarmConfig(n_agents=2)
    params = make_agent_params(2, separation=5.0, cfg=cfg)
    st = sim_init(cfg, params)

    step_jit = jax.jit(lambda s: sim_rollout(
        s, 10, cfg, jnp.asarray(BEDROOM_WALLS), params,
        enable_targets=True))
    got_target = False
    went_goto = False
    for _ in range(25):           # 250 steps in 10-step chunks
        st, ms = step_jit(st)
        if bool(jnp.any(st.nav.has_target)):
            got_target = True
        if bool(jnp.any(st.nav.state == navm.GO_TO_TARGET)):
            went_goto = True
        if got_target and went_goto:
            break
    assert int(st.srv.n_frontiers) > 0        # frontiers detected
    assert got_target, "no agent ever received a frontier target"
    assert went_goto, "no agent entered GO_TO_TARGET"


def test_targets_disabled_by_default():
    cfg = SwarmConfig(n_agents=2)
    params = make_agent_params(2, separation=5.0, cfg=cfg)
    st = sim_init(cfg, params)
    final, _ = jax.jit(lambda s: sim_rollout(
        s, 100, cfg, jnp.asarray(BEDROOM_WALLS), params))(st)
    # reference ships the TARG path disabled: GO_TO_TARGET only ever
    # entered via Bot2's return-home, which needs > 2.5 m travel first
    assert not bool(jnp.any(final.nav.has_target &
                            ~final.nav.returning_home))
