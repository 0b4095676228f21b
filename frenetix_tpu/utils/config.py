"""Configuration system: typed dataclasses + YAML-directory merge.

Mirrors the reference's OmegaConf setup (`ConfigurationBuilder`,
cr_scenario_handler/utils/configuration_builder.py:14-91: every
`configurations/<module>/*.yaml` becomes a top-level key, CLI overrides merged
last) with plain dataclasses + PyYAML.  Defaults replicate
configurations/frenetix_motion_planner/{planning,cost,debug}.yaml and
configurations/simulation/{simulation,vehicle,prediction}.yaml.
"""
from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Optional

from frenetix_tpu.ops.kinematics import VehicleParams

__all__ = [
    "EvaluationConfig",
    "OcclusionConfig",
    "BehaviorConfig",
    "VisualizationConfig",
    "PlanningConfig",
    "DebugConfig",
    "SimulationConfig",
    "PredictionConfig",
    "FrenetixConfig",
    "DEFAULT_COST_WEIGHTS",
    "load_config",
    "parse_cli_overrides",
]

# configurations/frenetix_motion_planner/cost.yaml
DEFAULT_COST_WEIGHTS = {
    "acceleration": 0.0,
    "jerk": 0.0,
    "lateral_jerk": 0.2,
    "longitudinal_jerk": 0.2,
    "orientation_offset": 0.0,
    "path_length": 0.0,
    "lane_center_offset": 0.0,
    "velocity_offset": 1.0,
    "velocity": 0.0,
    "distance_to_reference_path": 5.0,
    "distance_to_obstacles": 0.0,
    "prediction": 0.2,
    "responsibility": 0.0,
}


@dataclass
class PlanningConfig:
    """configurations/frenetix_motion_planner/planning.yaml defaults."""

    dt: float = 0.1
    planning_horizon: float = 3.0
    low_vel_mode_threshold: float = 2.0
    replanning_frequency: int = 3
    emergency_mode: str = "stopping"  # "stopping" | "min_risk"
    t_min: float = 1.1
    d_min: float = -3.0
    d_max: float = 3.0
    d_ego_pos: bool = False
    sampling_min: int = 2
    sampling_max: int = 3
    # Neumaier-compensated weighted-cost summation: makes near-tie argmin
    # selection robust to compile-variant reassociation noise (see
    # ops.costs.weighted_total).  Off by default — bitwise parity with the
    # reference's plain dot product; measured tie margins justify it
    # (docs/TIE_MARGINS.md: min best-vs-second gap 1.5e-5 ≈ 15 f32 ulps
    # across the five reference scenarios, zero selections flipped).
    compensated_cost_sum: bool = False

    @property
    def n_steps(self) -> int:
        return int(self.planning_horizon / self.dt)


@dataclass
class DebugConfig:
    """configurations/frenetix_motion_planner/debug.yaml (TPU-relevant subset)."""

    save_all_traj: bool = False
    save_unweighted_costs: bool = False  # extra raw-term columns in logs.csv
    log_risk: bool = False               # selected-plan ego/obst risk logging
    activate_logging: bool = True
    kinematic_debug: bool = True
    matrix_bucket: int = 256     # candidate-count padding bucket (jit shapes)
    collision_report: bool = True


@dataclass
class SimulationConfig:
    """configurations/simulation/simulation.yaml subset."""

    max_steps_factor: float = 1.7   # "max_steps" — fraction of scenario horizon
    fallback_max_steps: int = 200
    start_multiagent: bool = False
    used_planner_interface: str = "FrenetPlannerInterface"  # simulation.yaml:9
    batched_device_agents: bool = False  # all agents' cycles in ONE device call
    sharded_device_agents: bool = False  # shard the agent axis over the mesh
                                         # (requires batched_device_agents)
    device_resident_sim: bool = False    # whole sim as one lax.scan, ONE fetch
                                         # per run (parallel/device_sim.py)
    check_road_boundary: bool = True     # executed off-road pose = failure
                                         # (reference simulation.py:474-495)
    number_of_agents: int = -1
    # multiagent selection (simulation.yaml:20-30): with use_specific_agents,
    # exactly `agent_ids` become agents; otherwise `number_of_agents` are
    # chosen — randomly (seeded, reproducible) or in scenario order
    use_specific_agents: bool = False
    agent_ids: list = field(default_factory=list)
    select_agents_randomly: bool = False
    # None → fresh entropy per run (real random sampling, like the
    # reference's process RNG); set an int for a reproducible pick
    agent_selection_seed: Optional[int] = None
    msg_log_mode: str = "INFO"           # simulation.yaml msg_log_mode
    ego_agent_id: int = 60000


@dataclass
class PredictionConfig:
    """configurations/simulation/prediction.yaml subset."""

    mode: str = "ground_truth"  # "ground_truth" | "constant_velocity" | "walenet"
    horizon_steps: int = 30
    cov_pos: float = 0.5        # ground-truth fixed covariance (prediction_helpers.py:209-261)
    sensor_radius: float = 50.0
    use_sensor_model: bool = True   # radius + rear-cone filtering per agent
    calc_occlusions: bool = False   # prediction.yaml calc_visible_area
    cone_angle: float = 20.0        # prediction.yaml cone_angle
    cone_safety_dist: float = 6.0
    max_obstacles: int = 16     # static padding bound for device tensors
    # inflate each obstacle's collision footprint by k·(mean σ over the
    # horizon) — 0.0 keeps reference parity (collision checks against the
    # raw predicted mean path).  Walenet's long-horizon drift (~3 m at 2.5 s
    # on scenario 36's oncoming car, within its own 1σ) makes gap judgments
    # optimistic; 1.0 absorbs it.
    uncertainty_margin_sigma: float = 0.0


@dataclass
class BehaviorConfig:
    """configurations/simulation/behavior.yaml (off by default, :2)."""

    use_behavior_planner: bool = False
    replanning_frequency: int = 3
    dt: float = 0.1
    stopping_mode_threshold: float = 10.0  # reactive_planner_cpp.py:332
    # device-sim FSM placement: "auto" moves the supported FSM subset into
    # the whole-run scan (behavior/device_fsm.py — one fetch per run);
    # "hybrid" forces the per-cycle host FSM path
    device_fsm: str = "auto"

    # path planner (behavior.yaml path_planner configs)
    dist_between_points: float = 0.125
    stepwise_lane_changes: bool = True
    preparation_time: float = 3.0   # s, static Prepare* goal length
    goal_time: float = 2.0          # s, static goal length
    distance_self_intersection: float = 10.0

    # velocity planner (behavior.yaml velocity_planner configs)
    ttc_norm: float = 8.0
    safety_distance_buffer: float = 2.0    # s
    a_max_delta: float = 0.3               # s
    comfortable_deceleration_rate: float = 3.4  # m/s²
    zero_velocity_threshold: float = 0.278      # m/s

    # stop point (behavior.yaml stop_point configs)
    default_time_horizon: float = 2.0
    min_stop_point_dist: float = 1.4
    min_stop_point_time: float = 1.0
    standing_obstacle_vel: float = 1.0

    # lane-conflict clearance for turn/intersection situations (the
    # reference leaves these clearance modules as TODO stubs,
    # FSM_logic_modules.py:1006-1157; see fsm.EgoFSM._conflict_clear)
    intersection_time_gap: float = 2.0   # s, safety gap after ego clears
    clearance_accel: float = 1.5         # m/s², assumed ego accel from the line

    # retained knobs of the round-1 module (still honored by the velocity
    # planner's TTC conditioning)
    time_headway: float = 1.8
    ttc_threshold: float = 4.0


@dataclass
class EvaluationConfig:
    """configurations/simulation/evaluation.yaml."""

    evaluate_agents: bool = False      # per-agent vehicle-dynamics solution check
    evaluate_simulation: bool = False  # criticality metrics for every agent
    evaluate_runtime: bool = False     # per-component timing tables
    radius: float = 100.0              # participants within this range count
    tau: float = 2.0                   # TET / TIT threshold
    a_max_lat: float = 8.0             # max lateral deceleration (a_lat_req)
    # per-metric enable map (evaluation.yaml criticality_metrics); metrics
    # missing from the map stay enabled
    criticality_metrics: dict = field(default_factory=dict)


@dataclass
class OcclusionConfig:
    """configurations/simulation/occlusion.yaml (off by default).

    `metric_thresholds` activates the full Frenetix-Occlusion metric gate
    (keys: harm/risk/cp/ttc/wttc/ttce/dce/be; None = deactivated — the
    yaml's activated_metrics list is implied by which thresholds are set).
    harm_threshold/risk_threshold remain as the default-gate shorthand."""

    use_occlusion_module: bool = False
    harm_threshold: float = 0.1
    risk_threshold: float = 1.0
    metric_thresholds: dict = field(default_factory=dict)
    max_phantoms: int = 4
    phantom_type: str = "pedestrian"   # agent_manager types incl. car/truck
    # spawn_locator (occlusion.yaml)
    spawn_point_behind_dynamic_obstacle: bool = True
    spawn_point_behind_static_obstacle: bool = True
    spawn_points_behind_turn: bool = False
    max_dynamic_spawn_points: int = 4
    max_static_spawn_points: int = 4
    # agent_manager prediction inflation (occlusion.yaml)
    variance_factor: float = 1.05
    size_factor_length: float = 1.2
    size_factor_width: float = 1.3


@dataclass
class VisualizationConfig:
    """configurations/simulation/visualization.yaml subset."""

    save_plots: bool = False
    show_plots: bool = False    # live interactive rendering per plotted step
    plot_interval: int = 5      # plot every k-th step
    save_gif: bool = False
    draw_traj_set: bool = False  # draw the full candidate fan (debug.yaml)
    window: float = 60.0         # plot_window_dyn
    show_labels: bool = True             # vehicle-id annotations
    draw_icons: bool = False             # windshield icon on vehicle boxes
    draw_reference_path: bool = True
    draw_predictions: bool = True
    draw_planning_problem: bool = True   # goal regions as filled polygons


@dataclass
class FrenetixConfig:
    planning: PlanningConfig = field(default_factory=PlanningConfig)
    debug: DebugConfig = field(default_factory=DebugConfig)
    simulation: SimulationConfig = field(default_factory=SimulationConfig)
    prediction: PredictionConfig = field(default_factory=PredictionConfig)
    visualization: VisualizationConfig = field(default_factory=VisualizationConfig)
    behavior: BehaviorConfig = field(default_factory=BehaviorConfig)
    occlusion: OcclusionConfig = field(default_factory=OcclusionConfig)
    evaluation: EvaluationConfig = field(default_factory=EvaluationConfig)
    vehicle: VehicleParams = field(default_factory=VehicleParams)
    cost_weights: dict = field(default_factory=lambda: dict(DEFAULT_COST_WEIGHTS))
    # cost.yaml external_cost_weights — occlusion soft-cost terms (the
    # reference wires these to the external Frenetix-Occlusion package; the
    # in-repo definitions live in occlusion.external_occlusion_costs)
    external_cost_weights: dict = field(default_factory=lambda: {
        "occ_pm": 0.0, "occ_um": 0.0, "occ_ve": 0.0})
    dtype: str = "float32"      # device dtype ("float32" on TPU, "float64" CPU tests)


def _dict_key_schema(path: str):
    """Known key sets for fixed-schema dict config fields — a typo'd key in
    them must not be a silent no-op (all reads use .get with defaults)."""
    if path == "cost_weights":
        return set(DEFAULT_COST_WEIGHTS)
    if path == "external_cost_weights":
        return {"occ_pm", "occ_um", "occ_ve"}
    if path == "occlusion.metric_thresholds":
        from frenetix_tpu.occlusion import PhantomThresholds

        return set(PhantomThresholds._fields)
    if path == "evaluation.criticality_metrics":
        from frenetix_tpu.evaluation.metrics import CRITICALITY_METRICS

        return set(CRITICALITY_METRICS)
    return None


def _apply_overrides(obj, overrides: dict, _path: str = "", _unknown=None):
    """Merge an override dict into the config tree; unknown keys are
    collected into `_unknown` (a misspelled key must not be a silent no-op —
    load_config raises for them in strict mode)."""
    for k, v in overrides.items():
        if not hasattr(obj, k):
            if _unknown is not None:
                _unknown.append(f"{_path}{k}")
            continue
        cur = getattr(obj, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            _apply_overrides(cur, v, _path=f"{_path}{k}.", _unknown=_unknown)
        elif isinstance(cur, dict) and isinstance(v, dict):
            allowed = _dict_key_schema(f"{_path}{k}")
            if allowed is not None and _unknown is not None:
                _unknown.extend(f"{_path}{k}.{kk}" for kk in v
                                if kk not in allowed)
            cur.update(v)
        elif isinstance(cur, VehicleParams) and isinstance(v, dict):
            extra = {"cr_vehicle_id", "wb_front_axle"}
            bad = [kk for kk in v if kk not in cur._fields and kk not in extra]
            if bad and _unknown is not None:
                _unknown.extend(f"{_path}{k}.{kk}" for kk in bad)
            if v.get("cr_vehicle_id") is not None:
                # reference semantics (configuration.py:60-83): resolve every
                # parameter from the CommonRoad vehicle-model DB by id, then
                # explicitly-provided non-None fields win
                from frenetix_tpu.ops.vehicle_db import resolve_vehicle

                ov = {kk: vv for kk, vv in v.items()
                      if kk != "cr_vehicle_id" and kk not in bad}
                setattr(obj, k, resolve_vehicle(v["cr_vehicle_id"], ov))
            else:
                setattr(obj, k, cur._replace(
                    **{kk: vv for kk, vv in v.items()
                       if kk in cur._fields and vv is not None}))
        else:
            setattr(obj, k, v)


def parse_cli_overrides(items) -> dict:
    """`["a.b=1", "cost_weights.prediction=0.5"]` → nested override dict.

    The analog of the reference's `OmegaConf.from_cli()` merge
    (configuration_builder.py:30-34).  Values parse as YAML scalars
    (ints/floats/bools/strings)."""
    import yaml

    out: dict = {}
    for item in items or []:
        if "=" not in item:
            raise ValueError(f"override {item!r} is not KEY=VALUE")
        key, raw = item.split("=", 1)
        value = yaml.safe_load(raw)
        node = out
        parts = key.strip().split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


def load_config(config_dir: Optional[str] = None, overrides: Optional[dict] = None,
                strict_overrides: bool = False) -> FrenetixConfig:
    """Build a FrenetixConfig: defaults ← YAML directory ← overrides dict.

    Like the reference's ConfigurationBuilder, every `<dir>/*.yaml` file merges
    under its stem as a section name (e.g. planning.yaml → cfg.planning.*).
    YAML files may carry extra keys (lenient); with `strict_overrides` the
    explicit overrides dict must resolve fully — a typo'd `--set` key raises
    instead of silently doing nothing.
    """
    cfg = FrenetixConfig()
    merged: dict = {}
    if config_dir and os.path.isdir(config_dir):
        import yaml

        for fname in sorted(os.listdir(config_dir)):
            if not fname.endswith((".yaml", ".yml")):
                continue
            with open(os.path.join(config_dir, fname)) as f:
                data = yaml.safe_load(f) or {}
            stem = os.path.splitext(fname)[0]
            if stem == "cost":
                # cost.yaml's two top-level maps are root-level config fields
                # (the reference's layout: cost_weights + external_cost_weights)
                for key in ("cost_weights", "external_cost_weights"):
                    if key in data:
                        merged.setdefault(key, {}).update(data[key])
            else:
                merged.setdefault(stem, {}).update(data)
    _apply_overrides(cfg, merged)
    if overrides:
        unknown: list = []
        _apply_overrides(cfg, overrides,
                         _unknown=unknown if strict_overrides else None)
        if strict_overrides and unknown:
            raise ValueError(f"unknown config override key(s): {unknown}")
    return cfg
