"""Reference-path substrate: host preprocessing + device-resident Frenet tables."""

from frenetix_tpu.geometry.refpath import RefPathTable, prepare_reference_path  # noqa: F401
