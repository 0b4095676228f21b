"""Regenerate docs/CONFIG.md from the typed config dataclasses.

Usage: python tools/gen_config_doc.py
"""
from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = """# Configuration reference

Every configuration key of `frenetix_tpu`, generated from the typed
dataclasses in `frenetix_tpu/utils/config.py` (the analogs of the
reference's `configurations/**/*.yaml`).  Any key is settable via
YAML config directories (`load_config(path)`) or dotted CLI
overrides: `--set section.key=value` (dict fields take
`--set section.dict.key=value`; unknown keys raise).
"""


def main():
    from frenetix_tpu.ops.kinematics import VehicleParams
    from frenetix_tpu.utils.config import FrenetixConfig

    cfg = FrenetixConfig()
    out = [HEADER]
    for f in dataclasses.fields(FrenetixConfig):
        val = getattr(cfg, f.name)
        if dataclasses.is_dataclass(val):
            doc = (type(val).__doc__ or "").strip().splitlines()
            out.append(f"\n## `{f.name}` — {doc[0] if doc else ''}\n")
            out.append("| key | default | type |")
            out.append("|---|---|---|")
            for sf in dataclasses.fields(type(val)):
                d = getattr(val, sf.name)
                out.append(f"| `{sf.name}` | `{d!r}` | {type(d).__name__} |")
        elif isinstance(val, VehicleParams):
            out.append(f"\n## `{f.name}` — vehicle parameters "
                       "(ops/kinematics.py VehicleParams; resolve a "
                       "CommonRoad model with `vehicle.cr_vehicle_id: 1|2|3`"
                       " + per-field overrides, ops/vehicle_db.py)\n")
            out.append("| key | default | type |")
            out.append("|---|---|---|")
            out.append("| `cr_vehicle_id` | `None` (legacy defaults) | int |")
            for name, d in val._asdict().items():
                out.append(f"| `{name}` | `{d!r}` | {type(d).__name__} |")
        elif isinstance(val, dict):
            out.append(f"\n## `{f.name}`\n")
            out.append("| key | default |")
            out.append("|---|---|")
            for k, v in val.items():
                out.append(f"| `{k}` | `{v!r}` |")
        else:
            out.append(f"\n## `{f.name}`\n\ndefault: `{val!r}`")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "CONFIG.md")
    open(path, "w").write("\n".join(out) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
