"""In-scan behavior FSM (behavior/device_fsm.py) vs the hybrid host FSM.

VERDICT r4 item 1: the FSM state vocabulary moves into the scan; the host
FSM remains the differential oracle.  Each test runs the same scenario
twice — once with the in-scan FSM (device_fsm='auto', the default) and
once forced hybrid (device_fsm='hybrid', the host FSM per cycle) — and
pins statuses, step counts, and executed trajectories equal.
"""
import numpy as np
import pytest


def _cfg(**kw):
    from frenetix_tpu.utils.config import load_config

    cfg = load_config()
    cfg.dtype = "float64"
    cfg.simulation.start_multiagent = True
    cfg.behavior.use_behavior_planner = True
    cfg.debug.activate_logging = False
    for k, v in kw.items():
        obj = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        setattr(obj, parts[-1], v)
    return cfg


def _run(scenario_fn, **kw):
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.sim import Simulation

    ds = DeviceSimulation(Simulation(scenario_fn(), _cfg(**kw)))
    return ds, ds.run()


def _pin_equal(res_a, res_b, label):
    assert [int(s) for s in res_a.status] == \
        [int(s) for s in res_b.status], label
    assert res_a.steps == res_b.steps, label
    np.testing.assert_allclose(
        res_a.trajectories[: res_a.steps],
        res_b.trajectories[: res_b.steps], atol=1e-9,
        err_msg=label)


@pytest.mark.parametrize("factory", [
    "make_traffic_light", "make_stop_sign", "make_yield_sign",
    "make_crosswalk", "make_convoy",
])
def test_in_scan_fsm_matches_hybrid(factory):
    """Every supported behavior family: the in-scan FSM must reproduce the
    hybrid (host-FSM) device run exactly — same statuses, same steps, same
    executed trajectories."""
    from frenetix_tpu.io import scenario_factory as sf

    fn = getattr(sf, factory)
    ds_scan, res_scan = _run(fn)
    assert ds_scan.fsm_in_scan, ds_scan._fsm_reason
    ds_hyb, res_hyb = _run(fn, **{"behavior.device_fsm": "hybrid"})
    assert not ds_hyb.fsm_in_scan
    _pin_equal(res_scan, res_hyb, factory)


def test_in_scan_fsm_matches_host_loop():
    """Traffic light, in-scan vs the plain HOST loop (not just the hybrid
    device path): closes the full chain host == hybrid == in-scan."""
    from frenetix_tpu.io.scenario_factory import make_traffic_light
    from frenetix_tpu.sim import Simulation

    ds, res_d = _run(make_traffic_light)
    assert ds.fsm_in_scan
    sim_h = Simulation(make_traffic_light(), _cfg())
    res_h = sim_h.run()
    assert [int(s) for s in res_d.status] == \
        [int(a.status) for a in sim_h.agents]
    assert res_d.steps == res_h.steps
    for col, aid in enumerate(res_d.agent_ids):
        h = res_h.histories[aid]
        for i in range(1, len(h)):
            np.testing.assert_allclose(
                res_d.trajectories[i - 1, col, :2], h[i].position,
                atol=1e-9, err_msg=f"agent {aid} step {i}")


def test_overtake_bails_to_hybrid():
    """behavior_overtake is in-scan ELIGIBLE (no turn goals, no nav lane
    changes) but the slow lead triggers an overtake initiation at runtime —
    the scan's bail flag must fire and the run must transparently re-execute
    on the hybrid path, ending with the hybrid outcome."""
    from frenetix_tpu.io.scenario_factory import make_behavior_overtake

    ds_scan, res_scan = _run(make_behavior_overtake)
    assert ds_scan.fsm_in_scan  # eligible at construction...
    ds_hyb, res_hyb = _run(make_behavior_overtake,
                           **{"behavior.device_fsm": "hybrid"})
    _pin_equal(res_scan, res_hyb, "behavior_overtake")
    # the hybrid rerun really happened (the FSM entered overtake states)
    assert ds_hyb._hybrid_fn is not None


def test_unsupported_scopes_fall_back_at_construction():
    from frenetix_tpu.io.scenario_factory import make_lane_change, \
        make_turn_left
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.sim import Simulation

    ds = DeviceSimulation(Simulation(make_turn_left(), _cfg()))
    assert not ds.fsm_in_scan and "goal type" in ds._fsm_reason
    ds = DeviceSimulation(Simulation(make_lane_change(), _cfg()))
    assert not ds.fsm_in_scan and "lane changes" in ds._fsm_reason


def test_in_scan_fsm_fleet_matches_solo():
    """Behavior fleet with the in-scan FSM: heterogeneous members (traffic
    light + stop sign + convoy) run as ONE vmapped scan and must equal
    their solo runs exactly — the configuration the round-4 verdict called
    out as 100x slower on the hybrid path."""
    from frenetix_tpu.io import scenario_factory as sf
    from frenetix_tpu.parallel.device_sim import DeviceSimulation, run_fleet
    from frenetix_tpu.sim import Simulation

    factories = [sf.make_traffic_light, sf.make_stop_sign, sf.make_convoy]
    sims = [DeviceSimulation(Simulation(fn(), _cfg())) for fn in factories]
    assert all(s.fsm_in_scan for s in sims)
    solo = [DeviceSimulation(Simulation(fn(), _cfg())).run()
            for fn in factories]
    fleet = run_fleet(sims)
    for fn, a, b in zip(factories, fleet, solo):
        _pin_equal(a, b, fn.__name__)
