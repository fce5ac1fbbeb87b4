"""Config file I/O: canonical round-trip, reference-yaml compatibility,
validation errors (successor of the reference's silent string-key relay,
SURVEY.md §5.6)."""

import dataclasses

import pytest

from mpc_ros_tpu.config import MPCParams, PlannerConfig, SolverConfig
from mpc_ros_tpu.config_io import (config_from_dict, config_to_dict,
                                   load_config, save_config)

# verbatim content of the reference's rosparam file
# (/root/reference/mpc_ros/params/mpc_params.yaml) — kept inline so the
# test runs without the reference checkout
REFERENCE_YAML = """
pub_twist_cmd: true
debug_info: false
delay_mode: true
max_speed: 0.5
waypoints_dist: -1.0
path_length: 5.0
goal_radius: 0.5
controller_freq: 10

mpc_steps: 20.0
mpc_ref_cte: 0.0
mpc_ref_vel: 0.5
mpc_ref_etheta: 0.0
mpc_w_cte: 100.0
mpc_w_etheta: 0000.0
mpc_w_vel: 1000.0
mpc_w_angvel: 100.0
mpc_w_angvel_d: 0.0
mpc_w_accel: 50.0
mpc_w_accel_d: 0.0
mpc_max_angvel: 1.5
mpc_max_throttle: 1.0
mpc_bound_value: 1.0e3
"""


def test_reference_yaml_loads(tmp_path):
    f = tmp_path / "mpc_params.yaml"
    f.write_text(REFERENCE_YAML)
    params, solver, planner = load_config(f)
    assert solver.n_steps == 20          # mpc_steps: 20.0 (float -> int)
    assert float(params.dt) == pytest.approx(0.1)   # 1 / controller_freq
    assert float(params.w_cte) == 100.0
    assert float(params.w_vel) == 1000.0
    assert float(params.w_etheta) == 0.0
    assert float(params.max_angvel) == 1.5
    assert float(params.bound_value) == 1e3
    assert planner.delay_mode is True
    assert planner.max_speed == 0.5
    assert planner.local_plan_length == 5.0      # path_length
    assert planner.limits.xy_goal_tolerance == 0.5   # goal_radius


def test_dynamic_reconfigure_key_spelling():
    """The cfg schema's unprefixed names load identically."""
    p, s, _ = config_from_dict({"steps": 30, "w_cte": 250.0,
                                "max_angvel": 2.0})
    assert s.n_steps == 30
    assert float(p.w_cte) == 250.0
    assert float(p.max_angvel) == 2.0


def test_max_throttle_reference_clamp():
    """Reference clamps max_throttle >= 0.1
    (/root/reference/mpc_ros/src/driving_state.cpp:76-79)."""
    p, _, _ = config_from_dict({"mpc_max_throttle": 0.01})
    assert float(p.max_throttle) == pytest.approx(0.1)


def test_canonical_round_trip(tmp_path):
    params = MPCParams(w_cte=321.0, dt=0.05)
    solver = SolverConfig(n_steps=25, max_sqp_iters=17, schedule="sorted")
    planner = PlannerConfig(delay_mode=False, max_speed=1.2)
    f = tmp_path / "cfg.yaml"
    save_config(f, params, solver, planner)
    p2, s2, pl2 = load_config(f)
    for fld in dataclasses.fields(params):
        assert float(getattr(p2, fld.name)) == pytest.approx(
            float(getattr(params, fld.name))), fld.name
    assert s2 == solver
    assert pl2 == planner


def test_unknown_keys_raise():
    with pytest.raises(ValueError, match="mpc_w_vell"):
        config_from_dict({"mpc_w_vell": 100.0})   # typo must not pass
    with pytest.raises(ValueError, match="solver.n_stepz"):
        config_from_dict({"solver": {"n_stepz": 10}})


def test_validation_rejects_bad_values():
    with pytest.raises(ValueError, match="n_steps"):
        config_from_dict({"solver": {"n_steps": 1}})
    with pytest.raises(ValueError, match="w_cte"):
        config_from_dict({"mpc": {"w_cte": -5.0}})
    with pytest.raises(ValueError, match="controller_freq"):
        config_from_dict({"controller_freq": 0.0})


def test_nested_wins_over_flat():
    p, _, _ = config_from_dict({"mpc_w_cte": 10.0, "mpc": {"w_cte": 99.0}})
    assert float(p.w_cte) == 99.0


def test_reference_defaults_match_cfg():
    """MPCParams.reference_defaults() is bit-exact to the reference's live
    dynamic_reconfigure defaults (cfg/MPCPlanner.cfg:23-37 — the only
    config path that takes effect there)."""
    from mpc_ros_tpu.config import MPCParams

    r = MPCParams.reference_defaults()
    assert float(r.w_cte) == 1000.0 and float(r.w_etheta) == 1000.0
    assert float(r.w_vel) == 100.0 and float(r.w_angvel) == 100.0
    assert float(r.w_accel) == 50.0 and float(r.w_angvel_d) == 0.0
    assert float(r.w_accel_d) == 10.0 and float(r.ref_vel) == 1.0
    assert float(r.max_angvel) == 1.0 and float(r.max_throttle) == 1.0
    assert float(r.bound_value) == 1000.0


def test_nested_sections_coerce_yaml_string_numerics(tmp_path):
    """YAML 1.1 parses `1e8` (unsigned exponent) as a STRING; nested
    solver/planner values must still coerce to their field types."""
    import yaml

    p = tmp_path / "c.yaml"
    p.write_text(
        "mpc: {w_cte: 300.0}\n"
        "solver: {mu_max: 1e8, n_steps: '12'}\n"
        "planner: {max_speed: 1e0, delay_mode: 'true',\n"
        "          limits: {xy_goal_tolerance: 1e-1}}\n")
    # precondition: PyYAML really does hand these over as strings
    raw = yaml.safe_load(p.read_text())
    assert isinstance(raw["solver"]["mu_max"], str)
    params, solver, planner = load_config(p)
    assert isinstance(solver.mu_max, float) and solver.mu_max == 1e8
    assert solver.n_steps == 12
    assert isinstance(planner.max_speed, float) and planner.max_speed == 1.0
    assert planner.delay_mode is True
    assert planner.limits.xy_goal_tolerance == 0.1


def test_validation_rejects_int_ddp():
    """`ddp: 1` in YAML parses as int and slips through an `in (True,
    False, 'auto')` check via int==bool equality, then bypasses the
    engines' explicit-True guard rails — the schema rejects non-bools."""
    with pytest.raises(ValueError, match="ddp"):
        config_from_dict({"solver": {"ddp": 1}})
    # the genuine spellings still pass
    for v in (True, False, "auto"):
        config_from_dict({"solver": {"ddp": v}})
