"""Host-side scenario ingestion (CommonRoad XML, pure Python)."""

from frenetix_tpu.io.commonroad import Scenario, load_scenario  # noqa: F401
