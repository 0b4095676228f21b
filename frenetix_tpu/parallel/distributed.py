"""Multi-host initialization + scenario sharding over DCN.

The distributed-communication layer of the framework (SURVEY §2.4 / §5.8):

  - intra-slice (ICI): agents shard over the device mesh with `shard_map`
    and exchange executed poses with one `all_gather` per step
    (parallel.mesh.sharded_full_cycle) — already jax collectives, nothing
    process-level needed;
  - cross-host (DCN): scenario-level parallelism is embarrassingly parallel
    (SURVEY §2.3 P3) — each host runs its share of the scenario set;
    `initialize()` wires `jax.distributed` so every process sees the global
    device set and `shard_scenarios` deals out the work.

This replaces the reference's `multiprocessing.Queue`/`Event` worker
processes with pickled CommonRoad payloads (agent_batch.py:19-222,
simulation.py:410-471): fixed-shape arrays over ICI in-step, process-level
work division only at scenario granularity.

Single-host degenerate behavior: `initialize()` is a no-op when no
coordinator is configured, and `shard_scenarios` returns the full list — the
module is safe to call unconditionally.
"""
from __future__ import annotations

import os

__all__ = ["initialize", "process_info", "shard_scenarios", "merge_score_csvs"]


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """`jax.distributed.initialize` with environment fallbacks.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    arguments are omitted (the standard multi-host launch contract).  A
    single-process launch (no coordinator anywhere) is a no-op.

    Returns True if a multi-process runtime was initialized.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return False
    num_processes = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "1")
    )
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0")
    )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_info():
    """(process_index, process_count) of this host."""
    import jax

    return jax.process_index(), jax.process_count()


def shard_scenarios(scenario_paths, process_id=None, num_processes=None):
    """Round-robin share of the scenario set for this host (SURVEY §2.3 P3).

    Deterministic across hosts: every host computes the same assignment from
    the same sorted list.  Delegates to scenario_sharding's round-robin so
    the single-host `--workers` pipeline and the multi-host path agree.
    """
    import jax

    if process_id is None:
        process_id = jax.process_index()
    if num_processes is None:
        num_processes = jax.process_count()
    paths = sorted(scenario_paths)
    return paths[process_id::num_processes]


def merge_score_csvs(log_dirs, out_path):
    """Concatenate per-host score_overview.csv files into one
    (the durable-sink merge of SURVEY §5.8; same format as
    run_scenario.py's writer)."""
    import csv

    rows, header = [], None
    for d in log_dirs:
        p = os.path.join(d, "score_overview.csv")
        if not os.path.isfile(p):
            continue
        with open(p, newline="") as f:
            r = list(csv.reader(f, delimiter=";"))
        if not r:
            continue
        header = header or r[0]
        rows.extend(r[1:])
    if header is None:
        return None
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f, delimiter=";")
        w.writerow(header)
        w.writerows(rows)
    return out_path
