"""Injury-probability (harm) models, vectorized over (M, O, T) tensors.

Behavioral spec: `/root/reference/risk_assessment/` —
  - harm_estimation.py: model dispatch by risk.json modes (harm_mode ∈
    {log_reg, ref_speed, gidas} × {ignore, sym, reduced} angle handling),
    obstacle protection table (:49-66), Δv by momentum exchange
    (helpers/properties.py:51-77), simplified crash-angle computation
    (harm_estimation.py:326-349).
  - utils/logistic_regression*.py, reference_speed*.py, gidas.py: the actual
    per-model formulas.
  - Coefficients embedded below mirror configurations/harm_parameters.json
    (published MAIS3+/MAIS2+ regression parameters).

TPU-native design: the reference's per-(obstacle, timestep) scalar loop with
Python `if` chains over impact-angle areas becomes `jnp.select` over angle-bin
masks, evaluated for every (candidate, obstacle, timestep) at once.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "DEFAULT_HARM_COEFFS",
    "ObstacleMeta",
    "obstacle_protection",
    "obstacle_mass",
    "angle_range",
    "log_reg_harm",
    "ref_speed_harm",
    "gidas_harm",
    "pedestrian_harm",
]

# configurations/harm_parameters.json (published regression coefficients)
DEFAULT_HARM_COEFFS = {
    "log_reg": {
        "complete_angle_areas": {
            "const": -4.626, "speed": 0.189,
            "imp": [-0.039, 0.018, 0.459, -0.125, -1.413, -0.116, -1.782,
                    -0.434, 0.482, 0.142, 0.400],  # Imp_1..Imp_11 (Imp_12 = 0)
        },
        "reduced_angle_areas": {
            "const": -4.476, "speed": 0.179,
            "driver_side": 0.250, "right_side": 0.259, "rear": -0.445,
        },
        "ignore_angle": {"const": -4.591, "speed": 0.185},
        "complete_sym_angle_areas": {
            "const": -4.620, "speed": 0.189,
            "imp": [0.209, 0.086, 0.470, -0.259, -1.590, -0.118],  # 1_11..6
        },
        "reduced_sym_angle_areas": {
            "const": -4.457, "speed": 0.177, "side": 0.244, "rear": -0.431,
        },
    },
    "ref_speed": {
        "complete_angle_areas": {
            "speeds": [52.886, 51.995, 39.992, 56.450, 107.092, 52.623,
                       123.535, 68.055, 40.475, 47.301, 42.249, 48.666],
            "exp": 1.592,
        },
        "reduced_angle_areas": {
            "front": 51.285, "right_side": 46.452, "rear": 66.953,
            "driver_side": 47.115, "exp": 1.531,
        },
        "ignore_angle": {"ref_speed": 51.144, "exp": 1.570},
        "complete_sym_angle_areas": {
            "speeds": [46.717, 49.427, 40.298, 61.349, 115.139, 52.787, 48.783],
            "exp": 1.589,
        },
        "reduced_sym_angle_areas": {
            "front": 51.287, "side": 46.774, "rear": 66.956, "exp": 1.531,
        },
    },
    "gidas": {"const": -5.820, "speed": 0.292},
    "pedestrian": {"const": 3.164, "speed": 0.288},
    "pedestrian_MAIS2+": {"const": 1.786, "speed": 0.259},
}

# harm_estimation.py:49-66 — protection by CommonRoad obstacle type
_PROTECTION = {
    "car": 1, "truck": 1, "bus": 1, "priorityVehicle": 1, "parkedVehicle": 1,
    "train": 1, "taxi": 1,
    "bicycle": 0, "pedestrian": 0, "motorcycle": 0, "unknown": 0,
    "roadBoundary": -1, "pillar": -1, "constructionZone": -1, "building": -1,
    "medianStrip": -1,
}


def obstacle_protection(obstacle_type: str) -> int:
    """1 = protective crash structure, 0 = unprotected, -1 = static structure."""
    return _PROTECTION.get(obstacle_type, 0)


def obstacle_mass(obstacle_type: str, size: float) -> float:
    """Estimated obstacle mass [kg] (helpers/properties.py:16-48)."""
    if obstacle_type in ("car", "priorityVehicle", "parkedVehicle", "taxi"):
        return -1333.5 + 526.9 * size**0.8
    return {
        "truck": 25000.0, "bus": 13000.0, "bicycle": 90.0, "pedestrian": 75.0,
        "train": 118800.0, "motorcycle": 250.0,
    }.get(obstacle_type, 0.0)


def meta_from_footprint(lengths, widths, xp=np, dtype=np.float32):
    """Crash metadata inferred from footprint area when obstacle TYPES are
    not available in the tensor path (device batches, occlusion phantoms).

    Footprint thresholds map onto the class constants of `obstacle_mass` /
    `obstacle_protection` (helpers/properties.py:16-48, harm_estimation.py:
    49-66): a pedestrian-sized box (≈0.2 m²) is an unprotected 75 kg body,
    bicycle-sized → 90 kg, motorcycle-sized → 250 kg; anything ≥ 2.5 m²
    gets the protected car-class regression.  The former behavior — car
    formula for everything — gave pedestrian-sized rows a NEGATIVE mass
    (−806 kg at 0.23 m²) and car-occupant harm curves.

    `xp` is the array namespace (numpy or jax.numpy) so the host planner and
    the fused device batch share one definition bit-for-bit.
    """
    size = lengths * widths
    protected = size >= 2.5
    car = -1333.5 + 526.9 * xp.maximum(size, 1.0) ** 0.8
    unprot = xp.where(size < 0.6, 75.0, xp.where(size < 1.4, 90.0, 250.0))
    mass = xp.where(protected, car, unprot).astype(dtype)
    return ObstacleMeta(mass=mass, protected=protected.astype(xp.int32))


class ObstacleMeta(NamedTuple):
    """Per-obstacle crash metadata (padded (O,) arrays)."""

    mass: jnp.ndarray       # (O,)
    protected: jnp.ndarray  # (O,) int: 1 protected, 0 unprotected, -1 structure

    @staticmethod
    def from_obstacles(obstacles, max_obstacles: int, dtype=np.float32):
        mass = np.zeros(max_obstacles, dtype)
        prot = np.ones(max_obstacles, np.int32)
        for k, ob in enumerate(obstacles[:max_obstacles]):
            prot[k] = obstacle_protection(ob.obstacle_type)
            mass[k] = obstacle_mass(ob.obstacle_type, ob.length * ob.width)
        return ObstacleMeta(mass=jnp.asarray(mass), protected=jnp.asarray(prot))


def angle_range(angle):
    """Wrap into ]-π, π] (helpers/collision_helper_function.py:42-57).

    DELIBERATE divergence: this repo wraps impact angles BEFORE area
    binning in every harm variant, while the reference's simplified
    production path bins the raw values (harm_estimation.py:329-335 —
    obs_angle = π + rel − yaw spans (−π, 3π), so roughly half of all
    geometrically front/side impacts collapse into the "rear"
    coefficient there).  The wrapped binning is the geometrically
    correct circular semantics; the relationship is pinned by
    tests/test_harm_dispatch_oracle.py (exact match against the
    reference evaluated on wrapped angles)."""
    wrapped = jnp.mod(angle + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    return jnp.where(wrapped == -jnp.pi, jnp.pi, wrapped)


def _sym_area_coeff(angle, imp6):
    """Angle-area coefficient for the 12-area symmetric model
    (logistic_regression_symmetrical.py:32-57 / the ref-speed twin): bin by
    |angle| in 30° sectors; imp6 = [Imp_1_11, ..., Imp_6] + implicit 0 for
    the frontal sector (impact 12)."""
    a = jnp.abs(angle_range(angle))
    deg = jnp.pi / 180.0
    bins = [
        a < 15 * deg,                       # impact 12 → 0 (or speeds[6])
        (a >= 15 * deg) & (a < 45 * deg),   # 1 / 11
        (a >= 45 * deg) & (a < 75 * deg),   # 2 / 10
        (a >= 75 * deg) & (a < 105 * deg),  # 3 / 9
        (a >= 105 * deg) & (a < 135 * deg),  # 4 / 8
        (a >= 135 * deg) & (a < 165 * deg),  # 5 / 7
    ]
    vals = [jnp.zeros_like(a)] + [jnp.full_like(a, c) for c in imp6[:5]]
    return jnp.select(bins, vals, jnp.full_like(a, imp6[5]))


def _reduced_sym_area_coeff(angle, side, rear):
    """4-area symmetric coefficient (logistic_regression_symmetrical.py:87-105)."""
    a = angle_range(angle)
    t_a = jnp.pi / 4.0
    t_b = 3.0 * t_a
    front = (a > -t_a) & (a < t_a)
    side_m = ((a >= t_a) & (a < t_b)) | ((a <= -t_a) & (a > -t_b))
    return jnp.where(front, 0.0, jnp.where(side_m, side, rear))


def _reduced_area_coeff(angle, driver_side, right_side, rear):
    """4-area asymmetric coefficient (logistic_regression_asymmetrical.py)."""
    a = angle_range(angle)
    t_a = jnp.pi / 4.0
    t_b = 3.0 * t_a
    front = (a > -t_a) & (a < t_a)
    driver = (a >= t_a) & (a < t_b)    # left / driver side
    right = (a <= -t_a) & (a > -t_b)
    return jnp.where(front, 0.0,
                     jnp.where(driver, driver_side, jnp.where(right, right_side, rear)))


def _complete_area_coeff(angle, imp11):
    """12-area asymmetric coefficient: impact 12 is frontal (±15°), impacts
    1..11 counter-clockwise in 30° sectors (logistic_regression.py)."""
    a = angle_range(angle)
    deg = jnp.pi / 180.0
    out = jnp.zeros_like(a)
    for i in range(11):  # impacts 1..11
        lo = (-15.0 - 30.0 * (i + 1)) * deg
        hi = lo + 30.0 * deg
        in_bin = (a > lo) & (a <= hi)
        # negative angles cover impacts 1..6; wrap handles 7..11 via +2π
        a_wrapped = jnp.where(a > 15 * deg, a - 2 * jnp.pi, a)
        in_bin = (a_wrapped > lo) & (a_wrapped <= hi)
        out = jnp.where(in_bin, imp11[i], out)
    return out


def log_reg_harm(delta_v, angle, coeffs=DEFAULT_HARM_COEFFS, *,
                 ignore_angle=False, sym=True, reduced=True):
    """MAIS3+ probability via logistic regression (all 5 variants):
    p = 1 / (1 + exp(-const - speed·Δv - area_coeff(angle)))."""
    lr = coeffs["log_reg"]
    if ignore_angle:
        c = lr["ignore_angle"]
        area = 0.0
    elif sym and reduced:
        c = lr["reduced_sym_angle_areas"]
        area = _reduced_sym_area_coeff(angle, c["side"], c["rear"])
    elif sym:
        c = lr["complete_sym_angle_areas"]
        area = _sym_area_coeff(angle, c["imp"])
    elif reduced:
        c = lr["reduced_angle_areas"]
        area = _reduced_area_coeff(angle, c["driver_side"], c["right_side"], c["rear"])
    else:
        c = lr["complete_angle_areas"]
        area = _complete_area_coeff(angle, c["imp"])
    return 1.0 / (1.0 + jnp.exp(-c["const"] - c["speed"] * delta_v - area))


def ref_speed_harm(delta_v, angle, coeffs=DEFAULT_HARM_COEFFS, *,
                   ignore_angle=False, sym=True, reduced=True):
    """MAIS3+ probability via the reference-speed model:
    p = min((Δv / v_ref(angle))^exp, 1) (reference_speed*.py)."""
    rs = coeffs["ref_speed"]
    if ignore_angle:
        c = rs["ignore_angle"]
        v_ref = jnp.full_like(jnp.asarray(delta_v), c["ref_speed"])
        expo = c["exp"]
    elif sym and reduced:
        c = rs["reduced_sym_angle_areas"]
        a = angle_range(angle)
        t_a = jnp.pi / 4.0
        t_b = 3.0 * t_a
        front = (a > -t_a) & (a < t_a)
        side = ((a >= t_a) & (a < t_b)) | ((a <= -t_a) & (a > -t_b))
        v_ref = jnp.where(front, c["front"], jnp.where(side, c["side"], c["rear"]))
        expo = c["exp"]
    elif sym:
        c = rs["complete_sym_angle_areas"]
        sp = c["speeds"]
        a = jnp.abs(angle_range(angle))
        deg = jnp.pi / 180.0
        bins = [a < 15 * deg] + [
            (a >= (15 + 30 * i) * deg) & (a < (45 + 30 * i) * deg) for i in range(5)
        ]
        vals = [jnp.full_like(a, sp[6])] + [jnp.full_like(a, sp[i]) for i in range(5)]
        v_ref = jnp.select(bins, vals, jnp.full_like(a, sp[5]))
        expo = c["exp"]
    elif reduced:
        c = rs["reduced_angle_areas"]
        a = angle_range(angle)
        t_a = jnp.pi / 4.0
        t_b = 3.0 * t_a
        front = (a > -t_a) & (a < t_a)
        driver = (a >= t_a) & (a < t_b)
        right = (a <= -t_a) & (a > -t_b)
        v_ref = jnp.where(front, c["front"],
                          jnp.where(driver, c["driver_side"],
                                    jnp.where(right, c["right_side"], c["rear"])))
        expo = c["exp"]
    else:
        c = rs["complete_angle_areas"]
        sp = jnp.asarray(c["speeds"])
        idx = jnp.clip(
            jnp.floor((angle_range(angle) + jnp.pi + jnp.pi / 12) / (jnp.pi / 6)),
            0, 11,
        ).astype(jnp.int32)
        v_ref = sp[idx]
        expo = c["exp"]
    return jnp.minimum((delta_v / v_ref) ** expo, 1.0)


def gidas_harm(delta_v, coeffs=DEFAULT_HARM_COEFFS):
    """MAIS2+ probability (gidas.py:46-55)."""
    c = coeffs["gidas"]
    return 1.0 / (1.0 + jnp.exp(-c["const"] - c["speed"] * delta_v))


def pedestrian_harm(delta_v, coeffs=DEFAULT_HARM_COEFFS):
    """Unprotected road user MAIS3+ (logistic_regression.py:152-159 — note the
    positive `const` enters with opposite sign)."""
    c = coeffs["pedestrian"]
    return 1.0 / (1.0 + jnp.exp(c["const"] - c["speed"] * delta_v))
