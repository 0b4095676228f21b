"""Sensor model: visibility determination for predictions.

Behavioral spec: `/root/reference/cr_scenario_handler/utils/sensor_model.py` —
  - radius filter (get_obstacles_in_radius, :81-116),
  - rear cone-angle ignore filter (ignore_vehicles_in_cone_angle, :39-78):
    drop obstacles behind the ego (rear-axle origin), beyond a safety
    distance, inside a total cone angle,
  - occlusion: visible-area polygon from the sensor circle minus obstacle
    shadows (get_visible_objects, :119+).  The shadow of each obstacle is the
    wedge behind its silhouette as seen from the ego (shapely in the
    reference; a ray-casting visibility test here — no shapely dependency).
"""
from __future__ import annotations

import numpy as np

__all__ = ["obstacles_in_radius", "filter_cone_angle", "visible_obstacles"]


def obstacles_in_radius(scenario, ego_id, ego_position, time_step, radius,
                        agent_ids=()):
    """IDs of obstacles with a state at `time_step` within `radius`."""
    out = []
    excluded = set(agent_ids) | {ego_id}
    for ob in scenario.obstacles.values():
        if ob.obstacle_id in excluded:
            continue
        st = ob.state_at_time(time_step)
        if st is None:
            continue
        if np.linalg.norm(np.asarray(st.position) - ego_position) < radius:
            out.append(ob.obstacle_id)
    return out


def filter_cone_angle(scenario, ids, ego_position, ego_orientation, time_step,
                      *, veh_length=4.508, cone_angle=20.0, cone_safety_dist=6.0):
    """Drop obstacles inside the rear cone (sensor_model.py:39-78)."""
    keep = []
    cone_rad = cone_angle * np.pi / 180.0
    c, s = np.cos(-ego_orientation), np.sin(-ego_orientation)
    for oid in ids:
        st = scenario.obstacles[oid].state_at_time(time_step)
        d = np.asarray(st.position) - ego_position
        loc = np.array([c * d[0] - s * d[1], s * d[0] + c * d[1]])
        loc[0] -= veh_length / 2.0
        dist = np.linalg.norm(loc)
        if loc[0] < 0 and dist > cone_safety_dist:
            ang = np.arctan2(loc[1], loc[0])
            if abs(abs(ang) - np.pi) < cone_rad / 2.0:
                continue
        keep.append(oid)
    return keep


def visible_obstacles(scenario, ego_id, ego_state, time_step, *, sensor_radius=50.0,
                      occlusions=True, cone_filter=True, veh_length=4.508,
                      cone_angle=20.0, cone_safety_dist=6.0, agent_ids=(),
                      return_area=False, road_segments=None, extra_occluders=()):
    """Full sensor pipeline: radius → rear-cone → visible-area occlusion.

    The occlusion stage uses the polar visible-area model
    (sim.visible_area.compute_visible_area — road-boundary walls + obstacle
    shadow wedges, matching get_visible_objects, sensor_model.py:119-269).

    ego_state: object with .position and .orientation.  Returns visible IDs
    (and the VisibleArea when `return_area`).
    """
    pos = np.asarray(ego_state.position, dtype=float)
    ids = obstacles_in_radius(
        scenario, ego_id, pos, time_step, sensor_radius, agent_ids
    )
    if cone_filter:
        ids = filter_cone_angle(
            scenario, ids, pos, ego_state.orientation, time_step,
            veh_length=veh_length, cone_angle=cone_angle,
            cone_safety_dist=cone_safety_dist,
        )
    if not occlusions:
        return (ids, None) if return_area else ids

    from frenetix_tpu.sim.visible_area import compute_visible_area

    area = compute_visible_area(
        scenario, ego_id, pos, time_step, sensor_radius,
        agent_ids=agent_ids, road_segments=road_segments,
        extra_occluders=extra_occluders,
    )
    visible = []
    for oid in ids:
        ob = scenario.obstacles[oid]
        st = ob.state_at_time(time_step)
        if st is not None and area.obstacle_visible(
            st.position, st.orientation, ob.length, ob.width
        ):
            visible.append(oid)
    return (visible, area) if return_area else visible
