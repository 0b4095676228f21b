"""Multi-agent simulation engine (host orchestration; device tensors per step)."""

from frenetix_tpu.sim.simulation import Simulation, SimulationResult  # noqa: F401
