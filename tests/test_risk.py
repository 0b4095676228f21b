"""Risk stack: bivariate-normal CDF, harm models, batched risk computation."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.stats import multivariate_normal

from frenetix_tpu.risk.probability import (
    bvn_cdf, rectangle_probability, normalize_probability,
)
from frenetix_tpu.risk.harm import (
    DEFAULT_HARM_COEFFS, log_reg_harm, ref_speed_harm, gidas_harm,
    pedestrian_harm, angle_range, obstacle_mass,
)


def test_bvn_cdf_against_scipy(rng):
    for _ in range(30):
        rho = rng.uniform(-0.95, 0.95)
        x, y = rng.normal(0, 1.5, 2)
        expected = multivariate_normal(
            mean=[0, 0], cov=[[1, rho], [rho, 1]]
        ).cdf([x, y])
        got = float(bvn_cdf(x, y, rho))
        np.testing.assert_allclose(got, expected, atol=5e-6)


def test_rectangle_probability_against_scipy(rng):
    for _ in range(20):
        mean = rng.normal(0, 2, 2)
        a = rng.uniform(0.3, 2.0)
        b = rng.uniform(0.3, 2.0)
        c = rng.uniform(-0.8, 0.8) * np.sqrt(a * b)
        cov = np.array([[a, c], [c, b]])
        lo = mean + rng.uniform(-3, -0.5, 2)
        hi = lo + rng.uniform(0.5, 3, 2)
        mn = multivariate_normal(mean=mean, cov=cov)
        expected = (
            mn.cdf(hi) - mn.cdf([lo[0], hi[1]]) - mn.cdf([hi[0], lo[1]]) + mn.cdf(lo)
        )
        got = float(
            rectangle_probability(jnp.asarray(lo), jnp.asarray(hi),
                                  jnp.asarray(mean), jnp.asarray(cov))
        )
        np.testing.assert_allclose(got, expected, atol=1e-5)


def test_angle_range():
    vals = np.array([0.0, np.pi, -np.pi, 3 * np.pi, -3 * np.pi, 4.0, -4.0])
    got = np.asarray(angle_range(jnp.asarray(vals)))
    for g in got:
        assert -np.pi < g <= np.pi + 1e-12
    np.testing.assert_allclose(got[0], 0.0)
    np.testing.assert_allclose(abs(got[1]), np.pi)


def _oracle_log_reg_reduced_sym(velocity, angle, coeff):
    """Scalar oracle of logistic_regression_symmetrical.py:70-110."""
    t_a = np.pi / 4
    t_b = 3 * t_a
    if -t_a < angle < t_a:
        a = 0.0
    elif t_a <= angle < t_b or -t_a >= angle > -t_b:
        a = coeff["log_reg"]["reduced_sym_angle_areas"]["side"]
    else:
        a = coeff["log_reg"]["reduced_sym_angle_areas"]["rear"]
    c = coeff["log_reg"]["reduced_sym_angle_areas"]
    return 1 / (1 + np.exp(-c["const"] - c["speed"] * velocity - a))


def test_log_reg_reduced_sym_matches_oracle(rng):
    for _ in range(100):
        v = rng.uniform(0, 30)
        ang = rng.uniform(-np.pi, np.pi)
        expected = _oracle_log_reg_reduced_sym(v, ang, DEFAULT_HARM_COEFFS)
        got = float(log_reg_harm(v, ang, sym=True, reduced=True))
        np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_log_reg_monotone_in_speed():
    v = jnp.linspace(0.0, 40.0, 50)
    for kw in [dict(ignore_angle=True), dict(sym=True, reduced=False),
               dict(sym=False, reduced=True), dict(sym=False, reduced=False)]:
        h = np.asarray(log_reg_harm(v, jnp.zeros_like(v), **kw))
        assert np.all(np.diff(h) > 0), kw
        assert np.all((h > 0) & (h < 1))


def test_ref_speed_and_gidas_range():
    v = jnp.linspace(0.0, 80.0, 40)
    h = np.asarray(ref_speed_harm(v, jnp.zeros_like(v)))
    assert np.all((h >= 0) & (h <= 1.0 + 1e-9))
    assert h[-1] == pytest.approx(1.0)  # above reference speed → certain harm
    g = np.asarray(gidas_harm(v))
    p = np.asarray(pedestrian_harm(v))
    assert np.all(np.diff(g) > 0) and np.all(np.diff(p) > 0)


def test_obstacle_mass_table():
    assert obstacle_mass("truck", 10.0) == 25000.0
    assert obstacle_mass("pedestrian", 0.5) == 75.0
    car = obstacle_mass("car", 4.5 * 2.0)
    assert 1000 < car < 2500


def test_normalize_probability_piecewise():
    ref_map = [
        (0.5, 0.6666666666666666 * 0.5 + 0.33333333333333337),
        (0.05, 1.1111111111111114 * 0.05 + 0.28888888888888886),
        (1e-3, 10.101010101010099 * 1e-3 + 0.198989898989899),
        (1e-6, 1000.001000001 * 1e-6 + 0.0999998999999),
        (1e-20, 900000000.0000001 * 1e-20 + 0.01),
        (1e-80, 0.001),
    ]
    for p, expected in ref_map:
        got = float(normalize_probability(jnp.asarray(p)))
        np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_trajectory_risks_sanity():
    """A candidate heading into an obstacle carries more risk than one
    steering clear; empty predictions → zero risk."""
    import jax

    from frenetix_tpu.geometry.refpath import prepare_reference_path
    from frenetix_tpu.ops.costs import PredictionTensors, empty_predictions
    from frenetix_tpu.ops.kinematics import VehicleParams, rollout_candidates
    from frenetix_tpu.ops.sampling import build_sampling_matrix
    from frenetix_tpu.risk.costs import trajectory_risks
    from frenetix_tpu.risk.harm import ObstacleMeta

    xy = np.stack([np.linspace(0, 200, 400), np.zeros(400)], axis=1)
    ref = prepare_reference_path(xy, extension=10.0)
    veh = VehicleParams()
    matrix = build_sampling_matrix(
        t1_vals=[3.0], ss1_vals=[10.0], d1_vals=[0.0, 3.0],
        x0_lon=(20.0, 10.0, 0.0), x0_lat=(0.0, 0.0, 0.0),
    )
    ro = jax.jit(
        rollout_candidates,
        static_argnames=("dt", "n_steps", "low_vel_mode", "quintic_lon"),
    )(jnp.asarray(matrix), ref, veh, dt=0.1, n_steps=30, low_vel_mode=False,
      x0_orientation=0.0)

    t_pred = 30
    means = np.zeros((1, t_pred, 2))
    means[0, :, 0] = 35.0 + 0.0 * np.arange(t_pred)  # parked in-lane at x=35
    covs = np.tile(np.eye(2) * 0.3, (1, t_pred, 1, 1))
    preds = PredictionTensors(
        means=jnp.asarray(means), inv_covs=jnp.asarray(np.linalg.inv(covs)),
        covs=jnp.asarray(covs), orientations=jnp.zeros((1, t_pred)),
        velocities=jnp.zeros((1, t_pred)),
        lengths=jnp.asarray([4.5]), widths=jnp.asarray([2.0]),
        valid=jnp.ones((1, t_pred), bool),
    )
    meta = ObstacleMeta(mass=jnp.asarray([1500.0]), protected=jnp.asarray([1]))
    risks = trajectory_risks(ro, preds, meta, veh.mass)
    ego = np.asarray(risks.ego_risk)
    assert ego[0] > 10 * max(ego[1], 1e-12), ego  # head-on ≫ swerving
    assert float(risks.obst_risk[0]) > 0

    risks0 = trajectory_risks(ro, empty_predictions(t_pred, jnp.float64),
                              ObstacleMeta(mass=jnp.zeros(0), protected=jnp.zeros(0, jnp.int32)),
                              veh.mass)
    assert np.all(np.asarray(risks0.ego_risk) == 0)


# ------------------------------------------------ lanelet-following reach sets


def test_spot_hexagon_params_formulas():
    """cv / bx / racc match the published formulas
    (reachable_set_simple.py:220-291)."""
    from frenetix_tpu.risk.reachable_set import spot_hexagon_params

    v, dt_rs, t_max, a_max = 10.0, 0.2, 2.0, 8.0
    c, bx, r, rear = spot_hexagon_params(v, dt_rs, t_max, a_max)
    t = np.arange(0.0, t_max + dt_rs / 2, dt_rs)
    np.testing.assert_allclose(c, v * t)
    np.testing.assert_allclose(r, 0.5 * a_max * t**2)
    t_bmax = np.sqrt(2 / 3) * v / a_max
    bx_expect = v * t - a_max**2 * t**3 / (2 * v)
    bx_expect[t > t_bmax] = v * t_bmax - a_max**2 * t_bmax**3 / (2 * v)
    np.testing.assert_allclose(bx, bx_expect)
    # rear clamp is monotone non-decreasing
    assert np.all(np.diff(rear) >= -1e-12)


def test_reachable_lanelet_closure_branching():
    """On the T-junction the closure from an approach lanelet contains its
    successor branches (depth recursion, reachable_set.py:201-248)."""
    from frenetix_tpu.io.commonroad import load_scenario
    from frenetix_tpu.risk.reachable_set import reachable_lanelet_ids

    sc = load_scenario(
        "/root/reference/example_scenarios/ZAM_Tjunction-1_23_T-1.xml"
    )
    # pick a lanelet that has successors (junction approach)
    start = next(l for l in sc.lanelets.values() if len(l.successors) >= 2)
    ids = reachable_lanelet_ids(sc, [start.lanelet_id], depth=3)
    assert start.lanelet_id in ids
    for suc in start.successors:
        assert suc in ids          # both branches reachable


def test_reach_grid_matches_host_oracle_on_junction():
    """Differential test (VERDICT r1 item 5): rasterized grid + device gather
    vs the exact host hexagon ∩ lanelet-union membership, on the branching
    T-junction, for probe points away from cell boundaries."""
    import jax.numpy as jnp

    from frenetix_tpu.io.commonroad import load_scenario
    from frenetix_tpu.risk.reachable_set import (
        build_reach_set_grids, point_in_lanelet_reach_set,
        points_in_reach_grids, reachable_lanelet_ids,
    )

    sc = load_scenario(
        "/root/reference/example_scenarios/ZAM_Tjunction-1_23_T-1.xml"
    )
    ob = sc.dynamic_obstacles[0]
    st = ob.initial_state
    grid = build_reach_set_grids(
        sc, [st.position], [st.orientation], [max(st.velocity, 3.0)],
        [ob.length], [ob.width], [True], cell=0.75, grid_n=96,
    )

    rng = np.random.default_rng(0)
    # probes across the grid, snapped to cell centers (the rasterization is
    # exact at cell centers; edges differ by construction)
    cell = grid.cell
    offsets = (rng.integers(-40, 40, size=(400, 2)) + 0.5) * cell
    probes = np.asarray(st.position)[None] + offsets

    ids = reachable_lanelet_ids(
        sc, sc.find_lanelets_by_position(np.asarray(st.position)), 3
    )
    rings = [sc.lanelets[l].polygon for l in ids]

    t_rs = grid.occupancy.shape[1]
    for j in (1, t_rs - 1):
        expect = point_in_lanelet_reach_set(
            probes, j, position=st.position, orientation=st.orientation,
            velocity=max(st.velocity, 3.0), length=ob.length, width=ob.width,
            lanelet_rings=rings,
        )
        got = np.asarray(points_in_reach_grids(
            jnp.asarray(probes)[:, None, :], jnp.full((1,), j, jnp.int32), grid
        ))[:, 0, 0]
        agree = (got == expect).mean()
        assert agree > 0.97, f"step {j}: grid/oracle agreement {agree:.3f}"
    # sanity: the reach set is non-trivial at the final step
    assert np.asarray(grid.occupancy[0, -1]).sum() > 10


def test_device_reach_grid_builder_matches_host_exactly():
    """The pure-jnp grid builder (build_reach_set_grids_device — what the
    device-resident sim uses for LIVE peer-agent grids inside the scan) must
    reproduce the host builder bit-exactly on float64: same occupancy
    rasters, same per-obstacle cell sizes, on the real T-junction map with
    randomized obstacle states (on-road, off-road, slow, fast, invalid)."""
    import jax
    import jax.numpy as jnp

    from frenetix_tpu.io.commonroad import load_scenario
    from frenetix_tpu.risk.reachable_set import (
        build_reach_set_grids, build_reach_set_grids_device, lanelet_tensors,
    )

    sc = load_scenario(
        "/root/reference/example_scenarios/ZAM_Tjunction-1_23_T-1.xml"
    )
    rng = np.random.default_rng(7)
    o = 6
    # positions spread over the junction area (some off-network), mixed
    # velocities incl. ~0, one invalid row
    pos = np.stack([rng.uniform(-5, 35, o), rng.uniform(-5, 55, o)], axis=1)
    ths = rng.uniform(-np.pi, np.pi, o)
    vs = np.concatenate([[0.0, 14.0], rng.uniform(1.0, 9.0, o - 2)])
    lens = rng.uniform(3.5, 9.0, o)
    wids = rng.uniform(1.6, 2.5, o)
    valid = np.ones(o, bool)
    valid[3] = False

    host = build_reach_set_grids(sc, pos, ths, vs, lens, wids, valid)

    lane = lanelet_tensors(sc)
    dev = jax.jit(lambda *a: build_reach_set_grids_device(*a, lane))(
        jnp.asarray(pos), jnp.asarray(ths), jnp.asarray(vs),
        jnp.asarray(lens), jnp.asarray(wids), jnp.asarray(valid),
    )

    np.testing.assert_array_equal(np.asarray(host.valid), np.asarray(dev.valid))
    np.testing.assert_array_equal(np.asarray(host.cell), np.asarray(dev.cell))
    np.testing.assert_array_equal(np.asarray(host.origin), np.asarray(dev.origin))
    occ_h, occ_d = np.asarray(host.occupancy), np.asarray(dev.occupancy)
    assert occ_h.shape == occ_d.shape
    assert occ_h[0].any() and occ_h[1].any(), "degenerate test inputs"
    np.testing.assert_array_equal(occ_h, occ_d)
    # caching: second call reuses the per-scenario tensors
    assert lanelet_tensors(sc) is lane


def test_responsibility_reach_grid_direction():
    """A candidate driving INTO an obstacle's reach set keeps the obstacle's
    risk (cost contribution 0); a candidate outside it gets the risk
    subtracted (negative cost)."""
    import jax.numpy as jnp

    from frenetix_tpu.risk.reachable_set import (
        ReachSetGrid, responsibility_reach_grid,
    )

    g = 32
    occ = np.zeros((1, 3, g, g), bool)
    occ[0, :, g // 2:, :] = True   # x ≥ 0 half-plane reachable (i indexes x)
    grid = ReachSetGrid(
        origin=jnp.zeros((1, 2)), occupancy=jnp.asarray(occ),
        valid=jnp.ones(1, bool), cell=1.0, dt_rs=0.2,
    )

    class Risks:
        obst_present = jnp.ones(1)
        obst_risk_per_obst = jnp.full((1, 1), 0.7)[0:1, 0]

    risks = Risks()
    risks.obst_risk_per_obst = jnp.asarray([0.7])

    class RO:
        # two candidates, 5 steps: one in the reachable half, one outside
        x = jnp.asarray([[0.0, 1, 2, 3, 4, 5], [0.0, -1, -2, -3, -4, -5]])
        y = jnp.asarray([[0.0, 3, 3, 3, 3, 3], [0.0, 3, 3, 3, 3, 3]])

    cost = np.asarray(responsibility_reach_grid(RO(), grid, risks, dt=0.1))
    assert cost[0] == 0.0          # inside → obstacle keeps responsibility
    assert cost[1] == -0.7         # outside → risk subtracted


def test_meta_from_footprint_classes():
    """Footprint-inferred crash metadata: pedestrian-sized rows are
    unprotected 75 kg bodies (the former car-formula default gave them
    NEGATIVE mass), car-sized rows keep the protected car regression; the
    numpy and jax instantiations agree (host/device parity)."""
    import jax.numpy as jnp

    from frenetix_tpu.risk.harm import meta_from_footprint, obstacle_mass

    lengths = np.array([0.36, 1.8, 2.2, 4.5])   # ped, bicycle, moto, car
    widths = np.array([0.65, 0.6, 0.8, 2.0])
    meta = meta_from_footprint(lengths, widths, xp=np, dtype=np.float64)
    assert meta.protected.tolist() == [0, 0, 0, 1]
    assert meta.mass[0] == 75.0
    assert meta.mass[1] == 90.0
    assert meta.mass[2] == 250.0
    assert np.isclose(meta.mass[3], obstacle_mass("car", 9.0))
    assert (meta.mass > 0).all()

    meta_j = meta_from_footprint(jnp.asarray(lengths), jnp.asarray(widths),
                                 xp=jnp, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(meta_j.mass), meta.mass, rtol=1e-12)
    assert np.array_equal(np.asarray(meta_j.protected), meta.protected)
