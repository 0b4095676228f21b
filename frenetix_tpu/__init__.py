"""frenetix_tpu — a TPU-native Frenet trajectory-sampling motion-planning framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
TUM-AVS/Frenetix-Motion-Planner (reference mounted at /root/reference): per
replanning cycle the planner evaluates a *batch* of candidate trajectories —
quartic longitudinal / quintic lateral polynomials in Frenet coordinates — as
one fused array program on TPU instead of an OpenMP loop over C++ trajectory
objects.

Layout
------
- ``ops``       batched numeric kernels: polynomial solves/rollout, Frenet→
                Cartesian kinematics, feasibility masks, cost stack, collision
                checks, selection (argmin).  All shapes static, all jit-able.
- ``geometry``  reference-path substrate: host-side polyline preprocessing into
                device-resident tables (s, θ, κ, dκ/ds) + batched coordinate
                conversions (replaces the C++ ``pycrccosy`` /
                ``frenetix.CoordinateSystemWrapper``).
- ``planner``   the replanning cycle: fused candidate evaluation + progressive
                sampling densification + fallback ladder (replaces
                ``ReactivePlannerCpp``/``ReactivePlannerPython``).
- ``risk``      harm / risk / collision-probability models.
- ``models``    prediction networks (Wale-Net port) + ground-truth prediction.
- ``sim``       multi-agent simulation engine (agents = leading array axis).
- ``parallel``  device-mesh sharding of agents/scenarios (pjit / shard_map).
- ``io``        CommonRoad scenario XML ingestion (host-side, pure Python).
- ``utils``     config system, logging (SQLite/CSV schemas), helpers.
"""

__version__ = "0.1.0"
