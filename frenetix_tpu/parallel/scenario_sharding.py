"""Multi-host scenario sharding (the evaluation pipeline's scale-out axis).

SURVEY §2.3 P3: the reference parallelizes the evaluation pipeline with a
4-worker `ProcessPoolExecutor` over scenario files (main.py:86-92).  On a
multi-host TPU slice the same axis shards over hosts: each host plans its
share of scenarios independently (no intra-step communication — the
embarrassingly parallel axis), and per-host results merge via the shared
filesystem or a final gather.

Single-process fallback: behaves as host 0 of 1.  `bench_scaling.py` at the
repo root measures the solves/s scaling methodology on a virtual device mesh.
"""
from __future__ import annotations

import os

__all__ = ["host_info", "shard_scenarios", "run_sharded_pipeline"]


def host_info():
    """(process_index, process_count) — jax.distributed if initialized."""
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def shard_scenarios(paths, process_index=None, process_count=None):
    """Deterministic round-robin shard of the scenario list for this host."""
    if process_index is None or process_count is None:
        process_index, process_count = host_info()
    return [p for i, p in enumerate(sorted(paths)) if i % process_count == process_index]


def run_sharded_pipeline(scenario_paths, config, logs_dir, *, evaluate=False,
                         msg_logger=None):
    """Run this host's shard of the scenario set; returns per-scenario results.

    Score rows land in `<logs_dir>/score_overview_host<i>.csv` so hosts never
    contend on one file; merge with `cat` or pandas afterwards.
    """
    import csv

    from frenetix_tpu.run_scenario import run_one

    idx, count = host_info()
    mine = shard_scenarios(scenario_paths, idx, count)
    out = []
    score_path = os.path.join(logs_dir, f"score_overview_host{idx}.csv")
    os.makedirs(logs_dir, exist_ok=True)
    with open(score_path, "w", newline="") as f:
        w = csv.writer(f, delimiter=";")
        w.writerow(["scenario", "agent", "timestep", "status", "message", "wall_s"])
        for path in mine:
            name = os.path.splitext(os.path.basename(path))[0]
            res = run_one(path, config, msg_logger,
                          log_dir=os.path.join(logs_dir, name), evaluate=evaluate)
            out.append(res)
            for aid, st in res.agent_status.items():
                w.writerow([name, aid, res.steps, st.name,
                            res.agent_messages[aid], round(res.wall_time, 2)])
    return out
