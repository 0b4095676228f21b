"""Multi-chip / batched agent parallelism: equivalence guarantees.

VERDICT r1 items 2 & 6: the sharded full-cycle program must select the SAME
trajectories as the single-device batched path and as the per-agent
sequential `evaluate_cycle`; the batched Simulation mode must produce the
same agent outcomes as the sequential host loop — including the in-batch
responsibility term and occlusion safety gate.

Runs on the 8-device virtual CPU mesh (conftest.py).
"""
import numpy as np
import pytest


# ----------------------------------------------------- program equivalence


@pytest.fixture(scope="module")
def stacked_problem():
    from bench_scaling import build_stacked_problem

    # 8 agents, 30-step horizon, well-separated roads
    return build_stacked_problem(8, dtype=np.float64, n_steps=30, spread=12.0)


def test_sharded_equals_vmap_equals_sequential(stacked_problem):
    import jax
    import jax.numpy as jnp

    from frenetix_tpu.parallel.mesh import (
        CTX_IN_AXES, batched_full_cycle, make_agent_mesh, sharded_full_cycle,
    )
    from frenetix_tpu.planner.core import evaluate_cycle

    matrices, masks, ctx = stacked_problem
    a = matrices.shape[0]
    dt, n_steps = 0.1, 30

    from frenetix_tpu.planner.core import CycleContext

    def slice_ctx(ctx, i):
        return CycleContext(
            ref=jax.tree.map(lambda x: x[i], ctx.ref),
            veh=ctx.veh, weights=ctx.weights,
            preds=jax.tree.map(lambda x: x[i], ctx.preds),
            obstacle_xy=ctx.obstacle_xy[i], obstacle_valid=ctx.obstacle_valid[i],
            corridor=ctx.corridor[i],
            lane_segments=ctx.lane_segments[i], lane_valid=ctx.lane_valid[i],
            x0_orientation=ctx.x0_orientation[i],
            desired_velocity=ctx.desired_velocity[i],
            desired_avg_velocity=ctx.desired_avg_velocity[i],
        )

    # sequential per-agent full cycles (the production single-agent path)
    seq_best, seq_found, seq_cost = [], [], []
    for i in range(a):
        ctx_i = slice_ctx(ctx, i)
        res = evaluate_cycle(
            matrices[i], masks[i], ctx_i, dt=dt, n_steps=n_steps,
            low_vel_mode=False, check_boundary=True,
        )
        seq_best.append(int(res.best_idx))
        seq_found.append(bool(res.found))
        seq_cost.append(float(res.cost[res.best_idx]))

    # single-device vmap batch
    vmap_fn = batched_full_cycle(dt=dt, n_steps=n_steps)
    out_v = vmap_fn(matrices, masks, ctx)

    # 8-device sharded batch
    mesh = make_agent_mesh(jax.devices()[:8])
    shard_fn = sharded_full_cycle(mesh, dt=dt, n_steps=n_steps)
    out_s, poses_all = shard_fn(matrices, masks, ctx)

    assert np.asarray(out_v["best"]).tolist() == seq_best
    assert np.asarray(out_s["best"]).tolist() == seq_best
    assert np.asarray(out_v["found"]).tolist() == seq_found
    assert np.asarray(out_s["found"]).tolist() == seq_found
    np.testing.assert_allclose(np.asarray(out_v["cost"]), seq_cost, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out_s["cost"]), seq_cost, rtol=1e-12)
    # gathered poses are replicated and match the vmap selection's step-1 pose
    assert poses_all.shape == (a, 4)
    np.testing.assert_allclose(
        np.asarray(poses_all[:, 0]), np.asarray(out_v["x"][:, 1]), rtol=1e-12
    )


def _slice_ctx(ctx, i):
    import jax

    from frenetix_tpu.planner.core import CycleContext

    return CycleContext(
        ref=jax.tree.map(lambda x: x[i], ctx.ref),
        veh=ctx.veh, weights=ctx.weights,
        preds=jax.tree.map(lambda x: x[i], ctx.preds),
        obstacle_xy=ctx.obstacle_xy[i], obstacle_valid=ctx.obstacle_valid[i],
        corridor=ctx.corridor[i],
        lane_segments=ctx.lane_segments[i], lane_valid=ctx.lane_valid[i],
        x0_orientation=ctx.x0_orientation[i],
        desired_velocity=ctx.desired_velocity[i],
        desired_avg_velocity=ctx.desired_avg_velocity[i],
    )


@pytest.mark.slow
@pytest.mark.slow
def test_in_batch_responsibility_matches_host_math(stacked_problem):
    """resp_weight ≠ 0: the device-side responsibility application
    (mesh._one_agent_select) must reproduce the host-side post-pass exactly
    — same re-selected best index and modified cost — on a synthetic grid
    that actually changes per-candidate costs."""
    import jax
    import jax.numpy as jnp

    from frenetix_tpu.parallel.mesh import (
        _default_obstacle_meta, batched_full_cycle, make_agent_mesh,
        sharded_full_cycle, stack_reach_grids,
    )
    from frenetix_tpu.planner.core import evaluate_cycle
    from frenetix_tpu.risk.costs import trajectory_risks
    from frenetix_tpu.risk.reachable_set import (
        ReachSetGrid, responsibility_reach_grid,
    )

    matrices, masks, ctx = stacked_problem
    a = matrices.shape[0]
    o = ctx.preds.means.shape[1]
    dt, n_steps, w = 0.1, 30, 0.3
    g_n, t_rs = 32, 11

    # the fixture's obstacles sit ~20 m off every trajectory (zero risk, so a
    # zero term) — move obstacle 0 next to the candidates' endpoint fan so
    # per-candidate risks are non-zero (agent i's road is offset spread·i=12i
    # in x; agent-0 candidates end around (40, 5))
    means = np.asarray(ctx.preds.means).copy()
    for i in range(a):
        means[i, 0, :, 0] = 40.0 + 12.0 * i
        means[i, 0, :, 1] = 5.0
    preds = ctx.preds._replace(means=jnp.asarray(means))
    ctx = ctx._replace(preds=preds, obstacle_xy=jnp.asarray(means[:, :, 0]))

    # obstacle 0's reach set covers only the +y half of its grid → candidates
    # split into inside/outside → the term varies per candidate
    grids = []
    for i in range(a):
        occ = np.zeros((o, t_rs, g_n, g_n), bool)
        occ[0, :, :, g_n // 2:] = True
        valid = np.zeros(o, bool)
        valid[0] = True
        grids.append(ReachSetGrid(
            origin=jnp.asarray(means[i, :, 0]),
            occupancy=jnp.asarray(occ),
            valid=jnp.asarray(valid),
            cell=jnp.asarray(np.full(o, 4.0)),
            dt_rs=0.2,
        ))
    stacked = stack_reach_grids(grids)

    exp_best, exp_cost = [], []
    term_spread = 0.0
    for i in range(a):
        ctx_i = _slice_ctx(ctx, i)
        res = evaluate_cycle(
            matrices[i], masks[i], ctx_i, dt=dt, n_steps=n_steps,
            low_vel_mode=False, check_boundary=True,
        )
        risks = trajectory_risks(
            res.rollout, ctx_i.preds, _default_obstacle_meta(ctx_i.preds),
            ctx.veh.mass,
        )
        term = np.asarray(
            responsibility_reach_grid(res.rollout, grids[i], risks, dt)
        )
        sel = np.asarray(res.selectable)
        if sel.any():
            term_spread = max(term_spread, float(np.ptp(term[sel])))
        cost = np.asarray(res.cost) + w * term
        masked = np.where(sel, cost, np.inf)
        best = int(np.argmin(masked)) if sel.any() else int(res.best_idx)
        exp_best.append(best)
        exp_cost.append(float(cost[best]))
    assert term_spread > 0.0  # the synthetic grid must actually bite

    vfn = batched_full_cycle(dt=dt, n_steps=n_steps, resp_weight=w)
    out_v = vfn(matrices, masks, ctx, stacked)
    mesh = make_agent_mesh(jax.devices()[:8])
    sfn = sharded_full_cycle(mesh, dt=dt, n_steps=n_steps, resp_weight=w)
    out_s, _ = sfn(matrices, masks, ctx, stacked)
    assert np.asarray(out_v["best"]).tolist() == exp_best
    assert np.asarray(out_s["best"]).tolist() == exp_best
    np.testing.assert_allclose(np.asarray(out_v["cost"]), exp_cost, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out_s["cost"]), exp_cost, rtol=1e-12)


def test_agent_pose_predictions_device_rebuild(stacked_problem):
    """Constant-velocity obstacle tensors from gathered poses: straight-line
    extrapolation, self-row invalid."""
    import jax.numpy as jnp

    from frenetix_tpu.parallel.mesh import agent_pose_predictions

    poses = jnp.asarray(np.array([
        [0.0, 0.0, 0.0, 10.0],     # heading +x at 10 m/s
        [5.0, 3.0, np.pi / 2, 4.0],  # heading +y at 4 m/s
    ]))
    preds = agent_pose_predictions(
        poses, horizon=5, dt=0.1, length=5.0, width=2.2, cov_pos=0.5
    )
    assert preds.means.shape == (2, 2, 5, 2)
    # agent 0 advances +1 m/step along x
    np.testing.assert_allclose(
        np.asarray(preds.means[1, 0, :, 0]), [1.0, 2.0, 3.0, 4.0, 5.0], atol=1e-6
    )
    # agent 1 advances +0.4 m/step along y
    np.testing.assert_allclose(
        np.asarray(preds.means[0, 1, :, 1]), 3.0 + 0.4 * np.arange(1, 6), atol=1e-6
    )
    valid = np.asarray(preds.valid)
    assert not valid[0, 0].any() and not valid[1, 1].any()  # self masked
    assert valid[0, 1].all() and valid[1, 0].all()


# ----------------------------------------------- simulation-level parity


def _run_sim(batched: bool, responsibility: float = 0.0,
             occlusion: bool = False, maker=None):
    from frenetix_tpu.io.scenario_factory import make_highway
    from frenetix_tpu.sim.simulation import Simulation
    from frenetix_tpu.utils.config import FrenetixConfig

    cfg = FrenetixConfig(dtype="float64")
    cfg.simulation.start_multiagent = True
    cfg.simulation.batched_device_agents = batched
    cfg.cost_weights["responsibility"] = responsibility
    cfg.occlusion.use_occlusion_module = occlusion
    sim = Simulation(maker() if maker else make_highway(n_steps=80), cfg)
    res = sim.run()
    states = {
        a.id: np.array([[*s.position, s.velocity] for s in a.record.states])
        for a in sim.agents
    }
    return res, states


def test_batched_matches_sequential_outcomes():
    """Same multi-agent scenario, sequential host loop vs fused device batch:
    identical statuses and executed trajectories (VERDICT r1 weak #2)."""
    res_seq, st_seq = _run_sim(batched=False)
    res_bat, st_bat = _run_sim(batched=True)
    assert {k: v.name for k, v in res_seq.agent_status.items()} == \
           {k: v.name for k, v in res_bat.agent_status.items()}
    assert res_seq.steps == res_bat.steps
    for aid in st_seq:
        assert st_seq[aid].shape == st_bat[aid].shape
        np.testing.assert_allclose(st_seq[aid], st_bat[aid], atol=1e-9)


@pytest.mark.slow
@pytest.mark.slow
def test_batched_responsibility_matches_sequential():
    """Responsibility cost ≠ 0: the fused batch applies the lanelet reach-set
    term in-device (mesh._one_agent_select) and must match the sequential
    host post-pass (planner._apply_responsibility) on statuses and executed
    trajectories."""
    res_seq, st_seq = _run_sim(batched=False, responsibility=0.2)
    res_bat, st_bat = _run_sim(batched=True, responsibility=0.2)
    assert {k: v.name for k, v in res_seq.agent_status.items()} == \
           {k: v.name for k, v in res_bat.agent_status.items()}
    assert res_seq.steps == res_bat.steps
    for aid in st_seq:
        assert st_seq[aid].shape == st_bat[aid].shape
        np.testing.assert_allclose(st_seq[aid], st_bat[aid], atol=1e-9)


@pytest.mark.slow
@pytest.mark.slow
def test_batched_occlusion_matches_sequential():
    """Occlusion module on: phantom rows ride the stacked prediction tensors
    and the safety gate runs inside the fused batch (mesh._one_agent_select);
    outcomes must match the sequential host path (which gates through
    planner.set_occlusion_module)."""
    res_seq, st_seq = _run_sim(batched=False, occlusion=True)
    res_bat, st_bat = _run_sim(batched=True, occlusion=True)
    assert {k: v.name for k, v in res_seq.agent_status.items()} == \
           {k: v.name for k, v in res_bat.agent_status.items()}
    assert res_seq.steps == res_bat.steps
    for aid in st_seq:
        assert st_seq[aid].shape == st_bat[aid].shape
        np.testing.assert_allclose(st_seq[aid], st_bat[aid], atol=1e-9)


@pytest.mark.slow
@pytest.mark.slow
def test_in_batch_occlusion_gate_matches_host_math(stacked_problem):
    """The device-side occlusion gate must reproduce
    OcclusionModule.trajectory_safety_assessment + host re-selection exactly:
    same safe mask, same gated best index, and found=False when no candidate
    passes (forcing the host fallback)."""
    import jax
    import jax.numpy as jnp

    from frenetix_tpu.occlusion import OcclusionModule
    from frenetix_tpu.parallel.mesh import (
        _default_obstacle_meta, batched_full_cycle, make_agent_mesh,
        sharded_full_cycle,
    )
    from frenetix_tpu.planner.core import evaluate_cycle
    from frenetix_tpu.risk.costs import trajectory_risks

    matrices, masks, ctx = stacked_problem
    a = matrices.shape[0]
    o = ctx.preds.means.shape[1]
    dt, n_steps = 0.1, 30
    harm_thr, risk_thr = 1e-6, 1.0   # tight harm threshold so the gate bites

    # phantom = obstacle row 0, parked in the endpoint fan of each agent's
    # candidates (agent i's road is offset spread·i=12 i in x) so per-phantom
    # risks are non-zero and vary per candidate
    means = np.asarray(ctx.preds.means).copy()
    for i in range(a):
        means[i, 0, :, 0] = 40.0 + 12.0 * i
        means[i, 0, :, 1] = 3.0
    preds = ctx.preds._replace(means=jnp.asarray(means))
    ctx = ctx._replace(preds=preds, obstacle_xy=jnp.asarray(means[:, :, 0]))
    pm = np.zeros((a, o), bool)
    pm[:, 0] = True

    module = OcclusionModule(scenario=None, harm_threshold=harm_thr,
                             risk_threshold=risk_thr)
    exp_best, exp_found = [], []
    gate_varies = False
    for i in range(a):
        ctx_i = _slice_ctx(ctx, i)
        res = evaluate_cycle(
            matrices[i], masks[i], ctx_i, dt=dt, n_steps=n_steps,
            low_vel_mode=False, check_boundary=True,
        )
        risks = trajectory_risks(
            res.rollout, ctx_i.preds, _default_obstacle_meta(ctx_i.preds),
            ctx.veh.mass,
        )
        safe = np.asarray(module.trajectory_safety_assessment(risks, pm[i]))
        sel = np.asarray(res.selectable)
        if sel.any() and 0 < (safe & sel).sum() < sel.sum():
            gate_varies = True
        sel2 = sel & safe
        if sel2.any():
            exp_best.append(int(np.argmin(np.where(sel2, np.asarray(res.cost),
                                                   np.inf))))
            exp_found.append(True)
        else:
            exp_best.append(int(res.best_idx))
            exp_found.append(False)
    assert gate_varies  # the synthetic phantom must actually split candidates

    vfn = batched_full_cycle(dt=dt, n_steps=n_steps, occlusion=True,
                             harm_threshold=harm_thr, risk_threshold=risk_thr)
    out_v = vfn(matrices, masks, ctx, jnp.asarray(pm))
    mesh = make_agent_mesh(jax.devices()[:8])
    sfn = sharded_full_cycle(mesh, dt=dt, n_steps=n_steps, occlusion=True,
                             harm_threshold=harm_thr, risk_threshold=risk_thr)
    out_s, _ = sfn(matrices, masks, ctx, jnp.asarray(pm))
    assert np.asarray(out_v["best"]).tolist() == exp_best
    assert np.asarray(out_s["best"]).tolist() == exp_best
    assert np.asarray(out_v["found"]).tolist() == exp_found
    assert np.asarray(out_s["found"]).tolist() == exp_found


# --------------------------------------------------------- distributed glue


def test_shard_scenarios_partition():
    from frenetix_tpu.parallel.distributed import shard_scenarios

    paths = [f"s{i}.xml" for i in range(10)]
    shards = [shard_scenarios(paths, process_id=p, num_processes=3)
              for p in range(3)]
    joined = sorted(sum(shards, []))
    assert joined == sorted(paths)              # complete
    assert all(len(set(s)) == len(s) for s in shards)
    assert not (set(shards[0]) & set(shards[1]))  # disjoint


def test_distributed_initialize_noop_without_coordinator(monkeypatch):
    from frenetix_tpu.parallel.distributed import initialize

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert initialize() is False


def test_merge_score_csvs(tmp_path):
    import csv

    from frenetix_tpu.parallel.distributed import merge_score_csvs

    for i in range(2):
        d = tmp_path / f"host{i}"
        d.mkdir()
        with open(d / "score_overview.csv", "w", newline="") as f:
            w = csv.writer(f, delimiter=";")
            w.writerow(["scenario", "agent", "status"])
            w.writerow([f"sc{i}", "60000", "COMPLETED_SUCCESS"])
    out = merge_score_csvs([str(tmp_path / "host0"), str(tmp_path / "host1")],
                           str(tmp_path / "merged.csv"))
    with open(out, newline="") as f:
        rows = list(csv.reader(f, delimiter=";"))
    assert len(rows) == 3


def test_cli_dotted_overrides():
    from frenetix_tpu.utils.config import load_config, parse_cli_overrides

    ov = parse_cli_overrides([
        "planning.replanning_frequency=1",
        "cost_weights.prediction=0.5",
        "prediction.mode=walenet",
        "simulation.batched_device_agents=true",
    ])
    cfg = load_config(overrides=ov)
    assert cfg.planning.replanning_frequency == 1
    assert cfg.cost_weights["prediction"] == 0.5
    assert cfg.prediction.mode == "walenet"
    assert cfg.simulation.batched_device_agents is True


def test_strict_cli_overrides_reject_typos():
    import pytest as _pytest

    from frenetix_tpu.utils.config import load_config, parse_cli_overrides

    with _pytest.raises(ValueError, match="planing"):
        load_config(overrides=parse_cli_overrides(["planing.dt=0.2"]),
                    strict_overrides=True)
    # lenient mode (YAML-style) still ignores unknowns
    cfg = load_config(overrides=parse_cli_overrides(["planing.dt=0.2"]))
    assert cfg.planning.dt == 0.1


@pytest.mark.slow
@pytest.mark.slow
def test_inbatch_occlusion_gate_geometric_thresholds(stacked_problem):
    """The in-batch gate with a GEOMETRIC metric threshold (dce) matches the
    host shared-gate selection exactly — the full occlusion.yaml metric set
    runs inside the fused device batch, not just harm/risk."""
    import jax.numpy as jnp

    from frenetix_tpu.occlusion import OcclusionModule, PhantomThresholds
    from frenetix_tpu.parallel.mesh import (
        _default_obstacle_meta, batched_full_cycle,
    )
    from frenetix_tpu.planner.core import evaluate_cycle
    from frenetix_tpu.risk.costs import trajectory_risks

    matrices, masks, ctx = stacked_problem
    a = matrices.shape[0]
    o = ctx.preds.means.shape[1]
    dt, n_steps = 0.1, 30
    thr = PhantomThresholds(harm=None, risk=None, dce=6.0)

    # phantom = obstacle row 0, parked beside the endpoint fan of each
    # agent's candidates so per-candidate closest-encounter distances vary
    means = np.asarray(ctx.preds.means).copy()
    for i in range(a):
        means[i, 0, :, 0] = 40.0 + 12.0 * i
        means[i, 0, :, 1] = 3.0
    preds = ctx.preds._replace(means=jnp.asarray(means))
    ctx = ctx._replace(preds=preds, obstacle_xy=jnp.asarray(means[:, :, 0]))
    pm = np.zeros((a, o), bool)
    pm[:, 0] = True

    module = OcclusionModule(scenario=None, thresholds=thr, veh=ctx.veh,
                             dt=dt)
    exp_best, exp_found = [], []
    gate_varies = False
    for i in range(a):
        ctx_i = _slice_ctx(ctx, i)
        res = evaluate_cycle(
            matrices[i], masks[i], ctx_i, dt=dt, n_steps=n_steps,
            low_vel_mode=False, check_boundary=True,
        )
        risks = trajectory_risks(
            res.rollout, ctx_i.preds, _default_obstacle_meta(ctx_i.preds),
            ctx.veh.mass,
        )
        safe = np.asarray(module.trajectory_safety_assessment(
            risks, pm[i], rollout=res.rollout, preds=ctx_i.preds))
        sel = np.asarray(res.selectable)
        if sel.any() and 0 < (safe & sel).sum() < sel.sum():
            gate_varies = True
        sel2 = sel & safe
        if sel2.any():
            exp_best.append(int(np.argmin(np.where(sel2, np.asarray(res.cost),
                                                   np.inf))))
            exp_found.append(True)
        else:
            exp_best.append(int(res.best_idx))
            exp_found.append(False)
    assert gate_varies  # the dce threshold must actually split candidates

    vfn = batched_full_cycle(dt=dt, n_steps=n_steps, occlusion=True,
                             thresholds=thr)
    out_v = vfn(matrices, masks, ctx, jnp.asarray(pm))
    assert np.asarray(out_v["best"]).tolist() == exp_best
    assert np.asarray(out_v["found"]).tolist() == exp_found


@pytest.mark.slow
@pytest.mark.slow
def test_inbatch_occ_pm_soft_cost_matches_host(stacked_problem):
    """The occ_pm soft cost (cost.yaml external_cost_weights) applied inside
    the fused batch selects the same candidates as the host-side math."""
    import jax.numpy as jnp

    from frenetix_tpu.occlusion import external_occlusion_costs
    from frenetix_tpu.parallel.mesh import (
        _default_obstacle_meta, batched_full_cycle,
    )
    from frenetix_tpu.planner.core import evaluate_cycle
    from frenetix_tpu.risk.costs import trajectory_risks

    matrices, masks, ctx = stacked_problem
    a = matrices.shape[0]
    o = ctx.preds.means.shape[1]
    dt, n_steps = 0.1, 30
    w_pm = 1e6   # phantom risks are tiny here; the weight must move argmin

    means = np.asarray(ctx.preds.means).copy()
    for i in range(a):
        means[i, 0, :, 0] = 40.0 + 12.0 * i
        means[i, 0, :, 1] = 3.0
    preds = ctx.preds._replace(means=jnp.asarray(means))
    ctx = ctx._replace(preds=preds, obstacle_xy=jnp.asarray(means[:, :, 0]))
    pm = np.zeros((a, o), bool)
    pm[:, 0] = True

    exp_best = []
    shifted = False
    for i in range(a):
        ctx_i = _slice_ctx(ctx, i)
        res = evaluate_cycle(
            matrices[i], masks[i], ctx_i, dt=dt, n_steps=n_steps,
            low_vel_mode=False, check_boundary=True,
        )
        risks = trajectory_risks(
            res.rollout, ctx_i.preds, _default_obstacle_meta(ctx_i.preds),
            ctx.veh.mass,
        )
        extra = np.asarray(external_occlusion_costs(
            res.rollout, w_pm=w_pm, risks=risks, phantom_mask=pm[i]))
        sel = np.asarray(res.selectable)
        cost = np.where(sel, np.asarray(res.cost) + extra, np.inf)
        best = int(np.argmin(cost))
        if best != int(res.best_idx):
            shifted = True
        exp_best.append(best)
    assert shifted  # the soft cost must actually move some selection

    vfn = batched_full_cycle(dt=dt, n_steps=n_steps, occlusion=True,
                             harm_threshold=1e9, risk_threshold=1e9,
                             occ_pm_weight=w_pm)
    out_v = vfn(matrices, masks, ctx, jnp.asarray(pm))
    assert np.asarray(out_v["best"]).tolist() == exp_best


@pytest.mark.parametrize("seed", [11, 12])
def test_batched_parity_fuzzed_scenarios(seed):
    """Randomized multi-agent scenarios: the fused device batch and the
    sequential host loop must stay bit-identical on statuses and executed
    trajectories — not just on the hand-built highway."""
    from frenetix_tpu.io import scenario_factory as fac

    rng = np.random.default_rng(seed)
    params = dict(ego_v=float(rng.uniform(8, 16)),
                  lead_v=float(rng.uniform(3, 8)),
                  n_steps=70)

    def maker():
        return fac.make_overtake(**params)

    res_seq, st_seq = _run_sim(batched=False, maker=maker)
    res_bat, st_bat = _run_sim(batched=True, maker=maker)
    assert {k: v.name for k, v in res_seq.agent_status.items()} == \
           {k: v.name for k, v in res_bat.agent_status.items()}
    assert res_seq.steps == res_bat.steps
    for aid in st_seq:
        np.testing.assert_allclose(st_seq[aid], st_bat[aid], atol=1e-9)
