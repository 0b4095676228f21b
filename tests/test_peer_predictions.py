"""Peer-agent prediction parity (VERDICT r4 item 2).

Reference semantics (`update_scenario`,
/root/reference/cr_scenario_handler/simulation/simulation.py:743-779): each
agent's dummy obstacle carries its executed history + its CURRENT PLANNED
TRAJECTORY, and the next global prediction step runs the configured
predictor over it — so in ground-truth mode interacting agents see each
other's actual plans, and in walenet mode the net consumes executed
histories.  These tests pin that against the host Simulation.
"""
import numpy as np
import pytest

from frenetix_tpu.sim.agent import AgentStatus


def _sim(mode="ground_truth", **kw):
    from frenetix_tpu.io.scenario_factory import make_overtake
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.utils.config import load_config

    cfg = load_config()
    cfg.dtype = "float64"
    cfg.simulation.start_multiagent = True
    cfg.debug.activate_logging = False
    cfg.prediction.mode = mode
    for k, v in kw.items():
        obj = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        setattr(obj, parts[-1], v)
    return Simulation(make_overtake(), cfg)


def test_peers_see_each_others_plans_ground_truth():
    """After the first replan, a peer's prediction row must be the remainder
    of its current plan (rear-axle → center converted), not a CV
    extrapolation."""
    sim = _sim()
    assert len(sim.agents) >= 2

    # run a few steps so plans exist and agents have executed into them
    t = 0
    for _ in range(4):
        pd_base, ids = sim._predictions_for_step(t)
        per = {}
        for a in sim.agents:
            per[a.id] = sim._agent_predictions(pd_base, ids, a)[0]
        for a in sim.agents:
            from frenetix_tpu.sim.prediction import to_device
            import jax.numpy as jnp

            pd = per[a.id]
            a.step(to_device(pd, jnp), pd["means"][:, 0], pd["valid"][:, 0])
        t += 1
        sim._peer_rows_cache = None  # fresh rows next step

    ego, peer = sim.agents[0], sim.agents[1]
    assert peer.current_plan is not None
    pd_base, ids = sim._predictions_for_step(t)
    pd = sim._agent_predictions(pd_base, ids, ego)[0]

    # locate the peer's row: it is a row whose first mean equals the peer's
    # plan state at plan_step+1 (center frame)
    plan = peer.current_plan
    wb = sim.config.vehicle.wb_rear_axle
    j = peer.plan_step + 1
    th = float(plan.theta[j])
    expect0 = np.array([plan.x[j] + wb * np.cos(th),
                        plan.y[j] + wb * np.sin(th)])
    d = np.linalg.norm(pd["means"][:, 0] - expect0[None], axis=1)
    row = int(np.argmin(d))
    assert d[row] < 1e-9, "peer row must start at the peer's next plan state"

    # the whole row follows the plan remainder
    n = len(plan.x)
    horizon = pd["means"].shape[1]
    for i in range(horizon):
        jj = peer.plan_step + 1 + i
        if jj >= n:
            assert not pd["valid"][row, i]
            break
        thj = float(plan.theta[jj])
        np.testing.assert_allclose(
            pd["means"][row, i],
            [plan.x[jj] + wb * np.cos(thj), plan.y[jj] + wb * np.sin(thj)],
            atol=1e-9)
        assert pd["valid"][row, i]
        assert pd["velocities"][row, i] == pytest.approx(float(plan.v[jj]))
        assert pd["orientations"][row, i] == pytest.approx(thj)

    # a CV extrapolation of the current pose would differ once the peer's
    # plan curves or changes speed — assert the row is NOT the CV line
    from frenetix_tpu.sim.prediction import extrapolate_constant_velocity

    cv = extrapolate_constant_velocity(
        peer.state.position, peer.state.orientation, peer.state.velocity,
        horizon, sim.dt)
    assert not np.allclose(pd["means"][row], cv, atol=1e-6)


def test_peers_before_first_plan_use_recorded_trajectory():
    """At step 0 no plans exist yet; the reference's dummies still carry
    their original recorded trajectories (update_scenario returns early at
    global_timestep 0) — converted obstacles must be predicted from those."""
    sim = _sim()
    ego, peer = sim.agents[0], sim.agents[1]
    assert peer.current_plan is None
    ob = sim.scenario.obstacles.get(peer.id)
    assert ob is not None, "overtake peer is a converted dynamic obstacle"

    pd_base, ids = sim._predictions_for_step(0)
    pd = sim._agent_predictions(pd_base, ids, ego)[0]
    st1 = ob.state_at_time(1)
    d = np.linalg.norm(pd["means"][:, 0] - np.asarray(st1.position)[None],
                       axis=1)
    row = int(np.argmin(d))
    assert d[row] < 1e-9
    horizon = pd["means"].shape[1]
    for i in range(horizon):
        st = ob.state_at_time(1 + i)
        if st is None:
            assert not pd["valid"][row, i]
            break
        np.testing.assert_allclose(pd["means"][row, i], st.position,
                                   atol=1e-9)


def test_walenet_peers_predicted_from_executed_history():
    """walenet mode: peer rows come from the net over the peers' executed
    histories (WorldView), bit-equal to calling the net directly on the
    same live world."""
    pytest.importorskip("jax")
    import os

    if not os.path.exists("/root/reference/wale_net_lite/wale-net.onnx"):
        pytest.skip("walenet weights unavailable")
    sim = _sim(mode="walenet")
    ego, peer = sim.agents[0], sim.agents[1]

    import jax.numpy as jnp

    from frenetix_tpu.sim.prediction import to_device

    t = 0
    for _ in range(3):
        pd_base, ids = sim._predictions_for_step(t)
        per = {a.id: sim._agent_predictions(pd_base, ids, a)[0]
               for a in sim.agents}
        for a in sim.agents:
            pd = per[a.id]
            a.step(to_device(pd, jnp), pd["means"][:, 0], pd["valid"][:, 0])
        t += 1
        sim._peer_rows_cache = None

    pd_base, ids = sim._predictions_for_step(t)
    pd = sim._agent_predictions(pd_base, ids, ego)[0]

    # direct net call over the live world view
    from frenetix_tpu.models.walenet import walenet_predictions
    from frenetix_tpu.sim.world_view import WorldView

    wv = WorldView(sim.scenario, sim.agents,
                   veh_length=sim.config.vehicle.length,
                   veh_width=sim.config.vehicle.width)
    live_ids = [a.id for a in sim.agents
                if a.status in (AgentStatus.IDLE, AgentStatus.RUNNING)]
    k_peer = live_ids.index(peer.id)
    direct = walenet_predictions(
        sim.scenario, live_ids, t, pd["means"].shape[1],
        max_obstacles=len(live_ids), dtype=np.float64, world=wv)
    d = np.linalg.norm(pd["means"][:, 0] - direct["means"][k_peer, 0][None],
                       axis=1)
    row = int(np.argmin(d))
    assert d[row] < 1e-9
    np.testing.assert_allclose(pd["means"][row], direct["means"][k_peer],
                               atol=1e-9)
    # and it is NOT the recorded-trajectory prediction (history diverged)
    stale = walenet_predictions(
        sim.scenario, live_ids, t, pd["means"].shape[1],
        max_obstacles=len(live_ids), dtype=np.float64)
    assert not np.allclose(pd["means"][row], stale["means"][k_peer],
                           atol=1e-6) \
        or np.allclose(direct["means"][k_peer], stale["means"][k_peer],
                       atol=1e-6)
