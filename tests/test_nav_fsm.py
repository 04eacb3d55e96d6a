"""Navigation FSM unit tests — every reference transition
(AgentFirmware_Bot1.ino:393-607) exercised directly."""

import jax.numpy as jnp
import numpy as np
import pytest

from swarm_tpu.config import NavConfig
from swarm_tpu.models import nav as navm

CFG = NavConfig()


def mk(n=1, state=navm.FOLLOW, **kw):
    nav = navm.nav_init(n)._replace(
        state=jnp.full((n,), state, jnp.int32), **{
            k: jnp.asarray(v) for k, v in kw.items()})
    params = navm.NavParams(
        wall_side=jnp.ones((n,), jnp.int32),
        motor_pwm=jnp.full((n,), 205, jnp.int32),
        return_style=jnp.full((n,), navm.RETURN_STYLE_STRAIGHT, jnp.int32),
        home_x=jnp.zeros((n,)), home_y=jnp.zeros((n,)))
    return nav, params


def step(nav, params, front=1.0, left=0.25, back=1.0, right=1.0,
         pose=(1.0, 0.0, 0.0), dist=0.0, zone=None):
    ranges = jnp.asarray([[front, left, back, right]])
    est = jnp.asarray([list(pose)])
    zone_box = jnp.asarray([[0.0, 0.0, 0.0, 0.0]] if zone is None
                           else [list(zone)])
    has_zone = jnp.asarray([zone is not None])
    return navm.nav_step(nav, params, ranges, est,
                         jnp.asarray([dist]), zone_box, has_zone, 0.4, CFG)


def test_follow_drives_in_band():
    nav, p = mk()
    out, cmd = step(nav, p, front=1.0, left=0.25)
    assert int(out.state[0]) == navm.FOLLOW
    assert float(cmd.drive_m[0]) > 0
    assert float(cmd.steer_rad[0]) == 0.0       # in-band: straight


def test_follow_steers_toward_far_wall_and_away_from_close():
    nav, p = mk()
    _, far = step(nav, p, left=0.6)             # wall too far -> steer left
    assert float(far.steer_rad[0]) > 0
    _, close = step(nav, p, left=0.10)          # too close -> steer right
    assert float(close.steer_rad[0]) < 0


def test_follow_to_avoid_front(caplog=None):
    nav, p = mk()
    out, cmd = step(nav, p, front=0.25)         # < 30 cm blocks (ino:453)
    assert int(out.state[0]) == navm.AVOID_FRONT
    assert float(cmd.drive_m[0]) == 0.0


def test_follow_to_corner_round_on_wall_lost():
    nav, p = mk()
    out, _ = step(nav, p, left=0.9)             # > 80 cm = lost (ino:455)
    assert int(out.state[0]) == navm.CORNER_ROUND


def test_corner_round_burst_then_turn_to_wall():
    nav, p = mk(state=navm.CORNER_ROUND)
    out, cmd = step(nav, p, left=0.9)
    assert float(cmd.drive_m[0]) > 0            # 600 ms straight burst
    nav2 = out._replace(corner_elapsed_s=jnp.asarray([CFG.corner_burst_s]))
    out2, _ = step(nav2, p, left=0.9)
    assert int(out2.state[0]) == navm.TURN_TO_WALL


def test_turn_to_wall_bites_toward_wall():
    nav, p = mk(state=navm.TURN_TO_WALL)
    out, cmd = step(nav, p, left=0.9)
    # left-wall follower turns LEFT in 15->22 deg bites (ino:507-520)
    np.testing.assert_allclose(float(cmd.turn_cmd_rad[0]),
                               np.radians(CFG.turn_15_applied_deg), atol=1e-5)
    assert int(out.state[0]) == navm.TURN_TO_WALL
    out2, _ = step(nav, p, left=0.3)            # wall refound
    assert int(out2.state[0]) == navm.FOLLOW


def test_avoid_front_bites_away_until_clear():
    nav, p = mk(state=navm.AVOID_FRONT)
    out, cmd = step(nav, p, front=0.2)
    assert float(cmd.turn_cmd_rad[0]) < 0       # right bites (ino:523-538)
    assert int(out.state[0]) == navm.AVOID_FRONT
    out2, _ = step(nav, p, front=0.5)           # >= 35 cm clears
    assert int(out2.state[0]) == navm.FOLLOW


def test_go_to_target_heading_then_drive_then_reach():
    nav, p = mk(state=navm.GO_TO_TARGET, has_target=[True],
                target_x=[2.0], target_y=[0.0])
    # facing away: big heading error -> turn toward target
    out, cmd = step(nav, p, pose=(0.0, 0.0, np.pi / 2))
    assert abs(float(cmd.turn_cmd_rad[0])) > 0
    assert float(cmd.drive_m[0]) == 0.0
    # aligned -> drive
    out2, cmd2 = step(nav, p, pose=(0.0, 0.0, 0.0))
    assert float(cmd2.drive_m[0]) > 0
    # within 30 cm -> reached, back to FOLLOW, target dropped
    out3, _ = step(nav, p, pose=(1.8, 0.0, 0.0))
    assert int(out3.state[0]) == navm.FOLLOW
    assert not bool(out3.has_target[0])


def test_target_timeout_drops_target():
    nav, p = mk(state=navm.GO_TO_TARGET, has_target=[True],
                target_x=[2.0], target_y=[0.0],
                target_age_s=[CFG.target_timeout_s + 1.0])
    out, _ = step(nav, p, pose=(0.0, 0.0, 0.0))
    assert int(out.state[0]) == navm.FOLLOW


def test_zone_override_turns_away():
    nav, p = mk()
    # lookahead point (x+0.3) inside the forbidden box
    out, cmd = step(nav, p, pose=(1.0, 0.0, 0.0), zone=(1.1, -1.0, 3.0, 1.0))
    assert float(cmd.drive_m[0]) == 0.0
    np.testing.assert_allclose(float(cmd.turn_cmd_rad[0]),
                               -np.radians(CFG.zone_avoid_turn_deg),
                               atol=1e-5)


def test_return_home_injection_bot1_style():
    nav, p = mk()
    out, cmd = step(nav, p, pose=(0.1, 1.5, np.pi / 2),
                    dist=CFG.return_home_min_travel_m + 0.5)
    assert int(out.state[0]) == navm.RETURN_HOME_STRAIGHT
    assert bool(out.returning_home[0])
    # two right 22-degree bites commanded at once (ino:426-434)
    np.testing.assert_allclose(float(cmd.turn_cmd_rad[0]),
                               -2 * np.radians(CFG.turn_15_applied_deg),
                               atol=1e-5)


def test_return_home_straight_completes_at_wall():
    nav, p = mk(state=navm.RETURN_HOME_STRAIGHT, returning_home=[True])
    out, _ = step(nav, p, front=0.25, dist=3.0)
    assert bool(out.mission_complete[0])


def test_return_home_gohome_style():
    nav, p = mk()
    p = p._replace(return_style=jnp.asarray([navm.RETURN_STYLE_GOHOME]))
    out, _ = step(nav, p, pose=(0.1, 1.5, np.pi / 2),
                  dist=CFG.return_home_min_travel_m + 0.5)
    assert int(out.state[0]) == navm.GO_TO_TARGET
    assert bool(out.has_target[0])
    assert float(out.target_x[0]) == 0.0 and float(out.target_y[0]) == 0.0


def test_mission_complete_freezes():
    nav, p = mk(mission_complete=[True])
    out, cmd = step(nav, p, front=0.1, left=0.9)
    assert float(cmd.drive_m[0]) == 0.0
    assert float(cmd.turn_cmd_rad[0]) == 0.0
    assert int(out.state[0]) == int(nav.state[0])


def test_right_wall_follower_mirrors():
    nav, p = mk()
    p = p._replace(wall_side=jnp.asarray([-1], jnp.int32))
    # right wall too far -> steer right (negative)
    _, cmd = step(nav, p, left=1.0, right=0.6)
    assert float(cmd.steer_rad[0]) < 0
    nav2, _ = mk(state=navm.TURN_TO_WALL)
    out, cmd2 = step(nav2._replace(state=jnp.asarray([navm.TURN_TO_WALL])),
                     p, left=1.0, right=0.9)
    assert float(cmd2.turn_cmd_rad[0]) < 0      # bites RIGHT toward wall


def test_v1_proximity_mission_complete_same_tick():
    """v1 firmware: done when within 0.5 m of home after 1.6 m traveled;
    checkMissionComplete runs BEFORE the switch so the detection tick itself
    commands no motion (AgentFirmware.ino.ino:98-99, 253-262)."""
    nav, p = mk()
    p = p._replace(return_style=jnp.asarray([navm.RETURN_STYLE_PROXIMITY]))
    # Not enough travel yet -> keeps following.
    out, cmd = step(nav, p, pose=(0.3, 0.0, 0.0), dist=1.0)
    assert not bool(out.mission_complete[0])
    assert float(cmd.drive_m[0]) > 0
    # Back near home after the travel gate -> done, frozen this tick.
    out, cmd = step(nav, p, pose=(0.3, 0.0, 0.0),
                    dist=CFG.min_travel_distance_m + 0.2)
    assert bool(out.mission_complete[0])
    assert float(cmd.drive_m[0]) == 0.0
    assert float(cmd.turn_cmd_rad[0]) == 0.0
    # Outside the 0.5 m radius -> not done even with travel.
    out, _ = step(nav, p, pose=(0.8, 0.0, 0.0), dist=3.0)
    assert not bool(out.mission_complete[0])


def test_v1_proximity_never_injects_return_maneuver():
    """The v1 follower has no RETURN_HOME injection — crossing x~home with
    travel > 2.5 m must NOT flip it into RETURN_HOME_STRAIGHT/GO_TO_TARGET
    (the injection belongs to Bot1/Bot2 styles only)."""
    nav, p = mk()
    p = p._replace(return_style=jnp.asarray([navm.RETURN_STYLE_PROXIMITY]))
    out, _ = step(nav, p, pose=(0.1, 1.5, 0.0),
                  dist=CFG.return_home_min_travel_m + 0.5)
    assert int(out.state[0]) == navm.FOLLOW
    assert not bool(out.returning_home[0])
