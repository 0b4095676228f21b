"""Headline benchmark: candidate-trajectory evaluations/sec on one TPU chip.

Workload: the full fused replanning cycle (polynomial rollout, Frenet→
Cartesian, feasibility masks, full cost stack incl. inverse-Mahalanobis
prediction cost vs. 4 predicted obstacles, OBB collision checks, road-boundary
containment vs. ~1000 drivable-area quads, argmin selection) over a dense
sampling sweep — the BASELINE.json "Dense sampling sweep" config
(10–50k candidates/replan).

Baseline (vs_baseline denominator): the reference's C++/Eigen/OpenMP Frenetix
engine evaluates the same per-candidate pipeline at roughly 8 ms for ~800
candidates with 6 OpenMP workers on a desktop CPU (per-cycle
`calculation_time_s` instrumentation, logging_helpers.py:360; candidate counts
per sampling_matrix.py:152-195 at default levels).  We take a deliberately
generous 100,000 candidate-evals/sec as the single-chip baseline.

TIMING METHODOLOGY (round 4 — supersedes the r2/r3 numbers): over the axon
remote-TPU tunnel `jax.block_until_ready` resolves at SUBMISSION, not
completion — every earlier timing built on it measured dispatch, not compute
(r3's "0.25 ms / 505k agent-replans/s" headline was ~170× optimistic).  All
timings here are fetch-synchronized: wall(K calls + tiny fetch) minus
wall(1 call + tiny fetch) over K−1 cancels both the fetch round trip and the
dispatch pipeline fill; cross-checked against `jax.profiler.trace` op-time
sums (PERF.md "Timing on the axon tunnel").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} and appends
a drift row (per-config p50 across rounds) to PERF_HISTORY.json.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_CAND_EVALS_PER_SEC = 100_000.0


def build_workload(dtype=np.float32, density=5, bucket=1024):
    import jax.numpy as jnp

    from frenetix_tpu.geometry.refpath import prepare_reference_path
    from frenetix_tpu.ops.costs import COST_TERM_ORDER, PredictionTensors
    from frenetix_tpu.ops.kinematics import VehicleParams
    from frenetix_tpu.ops.sampling import (
        build_sampling_matrix, linspace_samples, pad_matrix, time_samples,
    )
    from frenetix_tpu.planner.core import CycleContext

    n_steps = 30
    dt = 0.1

    t = np.linspace(0, np.pi / 3, 600)
    center = np.stack([150 * np.sin(t), 150 * (1 - np.cos(t))], axis=1)
    ref_np = prepare_reference_path(center, extension=30.0, dtype=dtype)
    ref = type(ref_np)(*(jnp.asarray(f) for f in ref_np))

    # drivable corridor ±3.5 m
    from frenetix_tpu.geometry.corridor import strip_corridor
    corridor = strip_corridor(ref_np, 3.5)

    x0_lon = (40.0, 10.0, 0.0)
    x0_lat = (0.3, 0.0, 0.0)
    # dense sweep: level-5 velocity/lateral grids → 12·65·65 ≈ 35k candidates
    # (BASELINE.json config: 10-50k candidates/replan, full cost stack)
    t1 = np.unique(np.concatenate([time_samples(1.1, 3.0, dt, 2), [n_steps * dt]]))
    ss1 = np.union1d(linspace_samples(5.0, 15.0, density), [x0_lon[1]])
    d1 = np.union1d(linspace_samples(-3.0, 3.0, density), [x0_lat[0]])
    matrix = build_sampling_matrix(
        t1_vals=t1, ss1_vals=ss1, d1_vals=d1, x0_lon=x0_lon, x0_lat=x0_lat, dtype=dtype
    )
    matrix, mask = pad_matrix(matrix, bucket=bucket)

    o, t_pred = 4, n_steps
    means = np.zeros((o, t_pred, 2), dtype)
    for k in range(o):
        s_obs = 55.0 + 12.0 * k + 8.0 * dt * np.arange(t_pred)
        # host-side placement (NumPy — eager device ops over the axon tunnel
        # cost seconds per op)
        means[k, :, 0] = np.interp(s_obs, ref_np.s, ref_np.xy[:, 0])
        means[k, :, 1] = np.interp(s_obs, ref_np.s, ref_np.xy[:, 1])
    covs = np.tile(np.eye(2, dtype=dtype) * 0.5, (o, t_pred, 1, 1))
    preds = PredictionTensors(
        means=jnp.asarray(means),
        inv_covs=jnp.asarray(np.linalg.inv(covs).astype(dtype)),
        covs=jnp.asarray(covs),
        orientations=jnp.zeros((o, t_pred), dtype),
        velocities=jnp.full((o, t_pred), 8.0, dtype),
        lengths=jnp.full((o,), 4.5, dtype),
        widths=jnp.full((o,), 1.8, dtype),
        valid=jnp.ones((o, t_pred), bool),
    )

    weights = np.zeros(len(COST_TERM_ORDER), dtype)
    for name, w in dict(
        lateral_jerk=0.2, longitudinal_jerk=0.2, velocity_offset=1.0,
        distance_to_reference_path=5.0, prediction=0.2,
    ).items():
        weights[COST_TERM_ORDER.index(name)] = w

    ctx = CycleContext(
        ref=ref,
        veh=VehicleParams(),
        weights=jnp.asarray(weights),
        preds=preds,
        obstacle_xy=preds.means[:, 0],
        obstacle_valid=preds.valid[:, 0],
        corridor=jnp.asarray(corridor),
        lane_segments=jnp.zeros((0, 2, 2), dtype),
        lane_valid=jnp.zeros((0,), bool),
        x0_orientation=jnp.asarray(0.27, dtype),
        desired_velocity=jnp.asarray(12.0, dtype),
        desired_avg_velocity=jnp.asarray(12.0, dtype),
    )
    return jnp.asarray(matrix), jnp.asarray(mask), ctx, dt, n_steps, int(mask.sum())


def _err_summary(e) -> str:
    """Compact OOM/error summary: ANSI stripped, 'Ran out of memory …'
    fragment preferred, else the first non-empty line."""
    import re

    text = re.sub(r"\x1b\[[0-9;]*m", "", str(e))
    m = re.search(r"Ran out of memory.{0,120}", text)
    if m:
        return m.group(0)[:200]
    lines = [l.strip() for l in text.splitlines() if l.strip()]
    for l in lines:
        if "memory" in l.lower() or "RESOURCE_EXHAUSTED" in l:
            return l[:200]
    return lines[0][:200] if lines else type(e).__name__


def _tree_nbytes(tree) -> int:
    """Total array bytes in a pytree — argument+result HBM traffic of one
    call (the defensible lower bound on the fused program's HBM bytes)."""
    import jax

    return int(sum(getattr(leaf, "nbytes", 0)
                   for leaf in jax.tree.leaves(tree)))


def _fetch_small(out):
    """Synchronize by fetching the smallest output leaf (the ONLY reliable
    sync over the axon tunnel — block_until_ready resolves at submission)."""
    import jax

    leaf = min(jax.tree.leaves(out),
               key=lambda l: getattr(l, "nbytes", 1 << 62))
    return np.asarray(leaf)


def _timed_calls(fn, args, reps=8, outer=3):
    """Honest median per-call seconds: wall(reps calls + tiny fetch) minus
    wall(1 call + tiny fetch), over reps−1.  The subtraction cancels the
    fetch round trip and the dispatch pipeline fill; one executable's
    outputs all materialize together, so fetching the smallest leaf waits
    for the whole call.  Cross-checked against jax.profiler.trace op sums
    (they agree within ~15%)."""
    out = fn(*args)
    _fetch_small(out)                    # warm + drain

    def wall(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = fn(*args)
        _fetch_small(o)
        return time.perf_counter() - t0

    singles = sorted(wall(1) for _ in range(outer))
    batches = sorted(wall(reps) for _ in range(outer))
    per_call = (batches[outer // 2] - singles[outer // 2]) / (reps - 1)
    return float(max(per_call, 1e-9)), float(singles[outer // 2])


def _trace_top_ops(fn, args, n_calls=3, top=8):
    """Per-op device-time breakdown from a jax.profiler trace — the honest
    per-op roofline input (VERDICT r3 item 4)."""
    import collections
    import glob
    import gzip
    import tempfile

    import jax

    d = tempfile.mkdtemp(prefix="bench_trace_")
    with jax.profiler.trace(d):
        o = None
        for _ in range(n_calls):
            o = fn(*args)
        _fetch_small(o)
    paths = sorted(glob.glob(os.path.join(
        d, "plugins", "profile", "*", "*.trace.json.gz")), key=os.path.getmtime)
    if not paths:
        return None
    data = json.load(gzip.open(paths[-1]))
    names = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e["tid"])] = e["args"].get("name")
    agg = collections.defaultdict(float)
    for e in data["traceEvents"]:
        if (e.get("ph") == "X"
                and names.get((e["pid"], e["tid"])) == "XLA Ops"):
            agg[e["name"]] += e.get("dur", 0.0)
    total_us = sum(agg.values())
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    return {
        "device_ms_per_call": round(total_us / 1e3 / n_calls, 3),
        "top_ops": [{"op": n, "ms_per_call": round(us / 1e3 / n_calls, 3),
                     "frac": round(us / total_us, 3)} for n, us in rows],
    }


def _best_of_compiles(make_fn, args, n=2, reps=4):
    """Compile n structurally-distinct-but-equivalent program variants and
    keep the honestly-fastest (the remote toolchain occasionally lowers the
    same program into a slower configuration; with honest timing the spread
    is reported so future rounds can retire this if it stays small)."""
    best_fn, best_t = None, float("inf")
    variant_times = []
    for k in range(n):
        f = make_fn(k)
        per_call, _ = _timed_calls(f, args, reps=reps, outer=1)
        variant_times.append(per_call)
        if per_call < best_t:
            best_fn, best_t = f, per_call
    return best_fn, variant_times


def _append_history(row, path="PERF_HISTORY.json"):
    """Per-round drift table (VERDICT r3 item 10): one appended row per
    bench run with the p50s of the headline configs."""
    try:
        hist = json.load(open(path)) if os.path.exists(path) else []
    except Exception:
        hist = []
    hist.append(row)
    try:
        json.dump(hist, open(path, "w"), indent=1)
    except Exception:
        pass


def main():
    # persistent compilation cache (shared policy with run_scenario):
    # warm bench/production starts hit ~/.cache/frenetix_tpu/xla
    from frenetix_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from frenetix_tpu.planner.core import evaluate_cycle

    # fail fast with a diagnosable error if the remote-TPU tunnel is hung
    # (observed 2026-08-18: a trivial jit blocked indefinitely).  The probe
    # runs in a SUBPROCESS: a hung XLA call blocks in native code where
    # Python signal handlers cannot fire, so an in-process alarm cannot
    # interrupt it — but the parent can kill a child.
    import subprocess
    import sys

    for attempt in range(3):
        # the tunnel FLAPS (observed 2026-08-20: first contact sometimes
        # takes minutes, then recovers) — retry with a generous window
        # before declaring the device dead
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as j;"
                 "print(jax.jit(lambda v: v*2)(j.arange(8.0))[0])"],
                timeout=300, check=True, capture_output=True,
            )
            break
        except subprocess.TimeoutExpired:
            if attempt == 2:
                print("bench: device unresponsive (tunnel hang) — trivial "
                      "jit did not complete within 3x300 s", file=sys.stderr)
                raise SystemExit(1)
            print(f"bench: tunnel probe attempt {attempt + 1} timed out; "
                  "retrying", file=sys.stderr)

    def measure(density, bucket, reps=8, outer=3, compiles=2):
        """One workload size → timing + accounting dict."""
        matrix, mask, ctx, dt, n_steps, n_valid = build_workload(
            density=density, bucket=bucket
        )
        m_padded = matrix.shape[0]

        import jax.numpy as jnp

        def make_cycle(k):
            def cycle(matrix, mask, ctx):
                res = evaluate_cycle(
                    matrix, mask, ctx, dt=dt, n_steps=n_steps, low_vel_mode=False
                )
                # k fused zero-adds: distinct HLO per variant so each gets an
                # independent compilation (see _best_of_compiles)
                bump = sum([jnp.zeros(())] * k, jnp.zeros(())) if k else 0.0
                # reduce to the per-replan outputs a host would fetch
                return (res.best_idx, res.found,
                        res.cost[res.best_idx] + bump, res.histogram)
            return jax.jit(cycle)

        fn, variant_times = _best_of_compiles(
            make_cycle, (matrix, mask, ctx), n=compiles)
        # FLOPs + HBM traffic from the compiled executable's own cost model
        flops, bytes_acc = None, None
        try:
            cost = make_cycle(0).lower(matrix, mask, ctx).compile().cost_analysis()
            if cost and "flops" in cost:
                flops = float(cost["flops"])
            if cost and "bytes accessed" in cost:
                bytes_acc = float(cost["bytes accessed"])
        except Exception:
            pass

        cycle_s, single_s = _timed_calls(fn, (matrix, mask, ctx),
                                         reps=reps, outer=outer)
        # run-to-run spread (VERDICT r4 item 3): PERF_HISTORY showed a 2.1x
        # spread across same-day runs with no error bars — measure n
        # independent fetch-synchronized passes and publish p50 + spread
        # instead of one draw
        passes = sorted(
            [cycle_s] + [
                _timed_calls(fn, (matrix, mask, ctx), reps=reps,
                             outer=outer)[0]
                for _ in range(4)])
        return dict(
            m_padded=m_padded, n_valid=n_valid,
            cycle_s=passes[len(passes) // 2],
            cycle_s_passes=passes, flops=flops,
            bytes_accessed=bytes_acc, n_steps=n_steps,
            single_call_plus_fetch_s=single_s,
            variant_times=variant_times, fn=fn, fn_args=(matrix, mask, ctx),
            io_bytes=_tree_nbytes((matrix, mask, ctx)),
        )

    def measure_batched_agents(a, compiles=1):
        """A agents' FULL cycles fused in ONE device call (the production
        multi-agent path, parallel.mesh.batched_full_cycle) on the real chip:
        agent-replans/s vs. batch size.  768 padded candidates per agent
        (the default sampling level)."""
        from bench_scaling import build_stacked_problem
        from frenetix_tpu.parallel.mesh import _vmapped_body

        matrices, masks, ctx = build_stacked_problem(a, dtype=np.float32)

        vb = jax.jit(_vmapped_body(0.1, 30, False, 768))
        s, single_s = _timed_calls(vb, (matrices, masks, ctx),
                                   reps=6, outer=3)
        flops, bytes_acc = None, None
        try:
            cost = vb.lower(matrices, masks, ctx).compile().cost_analysis()
            flops = float(cost.get("flops", 0.0)) or None
            bytes_acc = float(cost.get("bytes accessed", 0.0)) or None
        except Exception:
            pass
        return {
            "agents": a,
            "p50_batch_latency_ms": round(1000.0 * s, 3),
            "agent_replans_per_sec": round(a / s, 1),
            "single_call_plus_fetch_ms": round(1000.0 * single_s, 3),
            "_seconds": s, "_flops": flops, "_bytes": bytes_acc,
            "_cands": int(matrices.shape[0] * matrices.shape[1]),
            "_io": _tree_nbytes((matrices, masks, ctx)),
            "_fn": vb, "_args": (matrices, masks, ctx),
        }

    def measure_numpy_backend(n_cands=192):
        """Measured CPU baseline denominator (VERDICT r2 item 6): the
        executable spec (planner/numpy_backend.py — reactive_planner.py:
        274-577 semantics) on the exact bench workload, per-candidate wall
        time extrapolated from a subset.  Pure NumPy float64 on host."""
        from frenetix_tpu.geometry.refpath import prepare_reference_path
        from frenetix_tpu.planner.numpy_backend import (
            check_feasibility_single, cost_terms_single,
        )
        from frenetix_tpu.ops.kinematics import VehicleParams
        from frenetix_tpu.ops.sampling import (
            build_sampling_matrix, linspace_samples, time_samples,
        )

        dtype = np.float64
        n_steps, dt = 30, 0.1
        t = np.linspace(0, np.pi / 3, 600)
        center = np.stack([150 * np.sin(t), 150 * (1 - np.cos(t))], axis=1)
        ref = prepare_reference_path(center, extension=30.0, dtype=dtype)
        veh = VehicleParams()
        x0_lon, x0_lat = (40.0, 10.0, 0.0), (0.3, 0.0, 0.0)
        t1 = np.unique(np.concatenate(
            [time_samples(1.1, 3.0, dt, 2), [n_steps * dt]]))
        ss1 = np.union1d(linspace_samples(5.0, 15.0, 5), [x0_lon[1]])
        d1 = np.union1d(linspace_samples(-3.0, 3.0, 5), [x0_lat[0]])
        matrix = build_sampling_matrix(
            t1_vals=t1, ss1_vals=ss1, d1_vals=d1, x0_lon=x0_lon,
            x0_lat=x0_lat, dtype=dtype)
        o, t_pred = 4, n_steps
        means = np.zeros((o, t_pred, 2), dtype)
        for k in range(o):
            s_obs = 55.0 + 12.0 * k + 8.0 * dt * np.arange(t_pred)
            means[k, :, 0] = np.interp(s_obs, ref.s, ref.xy[:, 0])
            means[k, :, 1] = np.interp(s_obs, ref.s, ref.xy[:, 1])
        inv = np.linalg.inv(np.tile(np.eye(2) * 0.5, (o, t_pred, 1, 1)))

        idx = np.linspace(0, len(matrix) - 1, n_cands).astype(int)
        t0 = time.perf_counter()
        for i in idx:
            res = check_feasibility_single(
                matrix[i], ref, veh, dt=dt, n_steps=n_steps,
                low_vel_mode=False, x0_orientation=0.27)
            cost_terms_single(res, dt=dt, desired_velocity=12.0,
                              pred_means=means, pred_inv_covs=inv,
                              pred_len=t_pred, obstacle_xy=means[:, 0])
        wall = time.perf_counter() - t0
        return round(n_cands / wall, 1)

    # headline config (dense sweep, ~35k candidates) + a candidates sweep
    headline = measure(density=5, bucket=1024, compiles=2)
    sweep = []
    V5E_BF16_PEAK = 197e12      # TPU v5e MXU peak, bf16 FLOP/s
    V5E_HBM_BPS = 819e9         # TPU v5e HBM bandwidth, B/s

    def roofline(flops, bytes_acc, seconds, io_bytes=None):
        """Roofline placement from the compiled program's own cost model and
        the HONEST (fetch-synchronized) per-call seconds.  Since round 4 the
        table interpolation is a gather (geometry/frenet.py), so the HLO
        flop count no longer contains the fictitious one-hot matmul — it is
        the executed-FLOP estimate directly.

        Bandwidth honesty: XLA's 'bytes accessed' is the PRE-FUSION op-level
        operand sum — reported as nominal only.  The defensible HBM-traffic
        LOWER bound is the argument+result buffer traffic (`io_bytes`);
        actual traffic sits between that and a few× it (the big rollout
        banks are materialized between fusions)."""
        if not flops or not seconds:
            return None
        mfu = flops / seconds / V5E_BF16_PEAK
        out = {
            "hlo_flops": flops,
            "achieved_tflops": round(flops / seconds / 1e12, 3),
            "mfu_vs_v5e_bf16_peak": round(mfu, 5),
        }
        if bytes_acc:
            out["hlo_bytes_accessed_nominal"] = bytes_acc
            bw_frac_nom = bytes_acc / seconds / V5E_HBM_BPS
            out["hbm_bw_fraction_if_nominal"] = round(bw_frac_nom, 4)
        if io_bytes:
            bw_frac = io_bytes / seconds / V5E_HBM_BPS
            out["io_bytes_per_call"] = int(io_bytes)
            out["hbm_gb_per_s_lower_bound"] = round(
                io_bytes / seconds / 1e9, 2)
            out["hbm_bw_fraction_lower_bound"] = round(bw_frac, 5)
            out["binding_resource"] = (
                "hbm_bandwidth" if bw_frac > mfu else
                ("compute" if mfu > 0.05 else "vpu_elementwise_or_bandwidth"))
        return out

    # density 6 (≈200k candidates) exceeds the 16G HBM of one v5e chip at
    # N=30 with the fused rollout live — the sweep tops out at ~35k; the
    # densest point reuses the headline measurement
    for density, bucket in ((2, 256), (3, 256), (4, 512)):
        r = measure(density=density, bucket=bucket, reps=6, outer=2,
                    compiles=1)
        sweep.append({
            "candidates_padded": r["m_padded"],
            "candidates_valid": r["n_valid"],
            "p50_cycle_latency_ms": round(1000.0 * r["cycle_s"], 3),
            "valid_cand_evals_per_sec": round(r["n_valid"] / r["cycle_s"], 1),
        })
    sweep.append({
        "candidates_padded": headline["m_padded"],
        "candidates_valid": headline["n_valid"],
        "p50_cycle_latency_ms": round(1000.0 * headline["cycle_s"], 3),
        "valid_cand_evals_per_sec": round(headline["n_valid"] / headline["cycle_s"], 1),
    })

    replans_per_sec = 1.0 / headline["cycle_s"]
    # honest accounting: padding rows are computed but are not useful work —
    # the headline counts only valid candidates (bench.py r1 counted padded)
    valid_evals_per_sec = headline["n_valid"] * replans_per_sec
    padded_evals_per_sec = headline["m_padded"] * replans_per_sec

    headline_roofline = roofline(
        headline["flops"], headline["bytes_accessed"], headline["cycle_s"],
        io_bytes=headline["io_bytes"])
    headline_ops = _trace_top_ops(headline["fn"], headline["fn_args"])

    def measure_device_sim():
        """End-to-end device-resident simulation (parallel/device_sim): the
        WHOLE multi-agent sim as one lax.scan + one fetch.  Reports executed
        agent-steps/s — the headless-evaluation throughput metric (the host
        loop pays a device round trip per step instead).  These walls were
        always honest (they include the real device_get)."""
        from frenetix_tpu.io.scenario_factory import make_overtake
        from frenetix_tpu.parallel.device_sim import DeviceSimulation
        from frenetix_tpu.sim import Simulation
        from frenetix_tpu.utils.config import load_config

        cfg = load_config()
        cfg.dtype = "float32"
        cfg.simulation.start_multiagent = True
        ds = DeviceSimulation(Simulation(make_overtake(), cfg))
        first = ds.run()                        # compile + correctness probe
        times = []
        for _ in range(3):
            r = ds.run()
            times.append(r.wall_time)
        agents = len(r.agent_ids)
        wall = float(np.median(times))
        out = {
            "agents": agents,
            "sim_steps": int(r.steps),
            "statuses": [int(s) for s in r.status],
            "wall_s_per_run": round(wall, 4),
            "sim_steps_per_sec": round(r.steps / wall, 1),
            "agent_steps_per_sec": round(agents * r.steps / wall, 1),
            "compile_s": round(first.wall_time - wall, 2),
        }

        # fleet: S scenario copies as one vmapped scan (run_scenario
        # --device-fleet); scenario-suite evaluation throughput
        from frenetix_tpu.parallel.device_sim import run_fleet

        def build(i):
            c = load_config()
            c.dtype = "float32"
            c.simulation.start_multiagent = True
            return DeviceSimulation(Simulation(
                make_overtake(lead_gap=40.0 + 2.0 * i), c))

        out["fleet"] = []
        # fail-soft: record where the chip tops out instead of dying there
        for s_n in (8, 16, 32, 64):
            try:
                fleet_sims = [build(i) for i in range(s_n)]
                t0 = time.perf_counter()
                run_fleet(fleet_sims)                  # compile + first run
                compile_wall = time.perf_counter() - t0
                walls = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    fleet = run_fleet(fleet_sims)
                    walls.append(time.perf_counter() - t0)
                fleet_wall = float(np.median(walls))
            except Exception as e:
                out["fleet_oom_at"] = {
                    "scenarios": s_n,
                    "error": _err_summary(e)}
                break
            total_steps = sum(r.steps * len(r.agent_ids) for r in fleet)
            # the gap sweep includes members whose overtake legitimately ends
            # in a collision (the planner's genuine outcome; host parity for
            # this family is pinned by tests/test_device_sim.py::
            # test_device_sim_collision_sweep_matches_host_order) — report
            # the status histogram, not a pass/fail bit
            counts = {}
            for r in fleet:
                for s in r.status:
                    counts[int(s)] = counts.get(int(s), 0) + 1
            out["fleet"].append({
                "scenarios": s_n,
                "status_counts": counts,
                "wall_s": round(fleet_wall, 3),
                "compile_plus_first_run_s": round(compile_wall, 2),
                "scenarios_per_sec": round(s_n / fleet_wall, 2),
                "agent_steps_per_sec": round(total_steps / fleet_wall, 1),
            })

        # behavior-enabled fleet (VERDICT r4 item 1): the in-scan FSM runs
        # the whole behavior stack inside the scan — one fetch per fleet
        # run, where the r4 hybrid paid one round trip per cycle
        # (0.3 scen/s fleet-of-8 over this tunnel)
        from frenetix_tpu.io.scenario_factory import (
            make_stop_sign, make_traffic_light, make_yield_sign)

        def build_behavior(i):
            c = load_config()
            c.dtype = "float32"
            c.simulation.start_multiagent = True
            c.behavior.use_behavior_planner = True
            fn = (make_traffic_light, make_stop_sign, make_yield_sign)[i % 3]
            return DeviceSimulation(Simulation(fn(), c))

        try:
            bsims = [build_behavior(i) for i in range(8)]
            assert all(s.fsm_in_scan for s in bsims), \
                [s._fsm_reason for s in bsims]
            t0 = time.perf_counter()
            run_fleet(bsims)
            b_compile = time.perf_counter() - t0
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                bres = run_fleet(bsims)
                walls.append(time.perf_counter() - t0)
            b_wall = float(np.median(walls))
            counts = {}
            for r in bres:
                for s in r.status:
                    counts[int(s)] = counts.get(int(s), 0) + 1
            out["behavior_fleet8_in_scan_fsm"] = {
                "scenarios": 8,
                "status_counts": counts,
                "wall_s": round(b_wall, 3),
                "compile_plus_first_run_s": round(b_compile, 2),
                "scenarios_per_sec": round(8 / b_wall, 2),
            }
        except Exception as e:
            out["behavior_fleet8_in_scan_fsm"] = {"error": _err_summary(e)}

        # warm start (VERDICT r3 item 5): fresh DeviceSimulation objects in
        # the same process — the jitted closures retrace, the persistent
        # compile cache serves the executables.  This is what a new process
        # with a warm ~/.cache/frenetix_tpu/xla pays.
        try:
            fresh = [build(i) for i in range(8)]
            t0 = time.perf_counter()
            run_fleet(fresh)
            out["fleet8_warm_start_s"] = round(time.perf_counter() - t0, 2)
        except Exception as e:
            out["fleet8_warm_start_s"] = _err_summary(e)
        return out

    # multi-agent fused-batch saturation sweep: grow the fused agent axis to
    # the HBM ceiling; the compute-bound operating point is the honest
    # throughput headline.
    agents_sweep, agents_oom_at = [], None
    top = None
    for a in (1, 16, 128, 512, 2048):
        try:
            if top is not None:
                # release the previous size's problem arrays + executable
                # BEFORE building the next one — retaining every sweep row's
                # buffers OOMed A=2048 (which fits standalone)
                for key in ("_fn", "_args"):
                    top.pop(key, None)
            agents_sweep.append(measure_batched_agents(a))
            top = agents_sweep[-1]
        except Exception as e:
            agents_oom_at = {"agents": a, "error": _err_summary(e)}
            break
    saturated_roofline = None
    saturated_ops = None
    if top and top["_flops"]:
        saturated_roofline = roofline(
            top["_flops"], top["_bytes"], top["_seconds"],
            io_bytes=top["_io"])
        saturated_ops = _trace_top_ops(top["_fn"], top["_args"])
    for row in agents_sweep:
        for key in ("_seconds", "_flops", "_bytes", "_cands", "_io",
                    "_fn", "_args"):
            row.pop(key, None)

    device_sim = measure_device_sim()

    result = {
        "metric": "valid_candidate_trajectory_evals_per_sec_per_chip",
        "value": round(valid_evals_per_sec, 1),
        "unit": "candidates/s",
        "vs_baseline": round(valid_evals_per_sec / BASELINE_CAND_EVALS_PER_SEC, 2),
        "detail": {
            "timing_methodology": "fetch-synchronized (block_until_ready "
                                  "does not sync over the axon tunnel; r2/r3 "
                                  "latencies were dispatch-only — see PERF.md)",
            "candidates_valid": headline["n_valid"],
            "candidates_padded": headline["m_padded"],
            "padded_cand_evals_per_sec": round(padded_evals_per_sec, 1),
            "replans_per_sec": round(replans_per_sec, 2),
            "p50_cycle_latency_ms": round(1000.0 * headline["cycle_s"], 3),
            "cycle_latency_pass_spread_ms": [
                round(1000.0 * t, 3) for t in headline["cycle_s_passes"]],
            "single_call_plus_fetch_ms": round(
                1000.0 * headline["single_call_plus_fetch_s"], 3),
            "compile_variant_spread_ms": [
                round(1000 * t, 3) for t in headline["variant_times"]],
            "flops_per_cycle": headline["flops"],
            "roofline": headline_roofline,
            "per_op_profile": headline_ops,
            "mfu_vs_v5e_bf16_peak": (headline_roofline or {}).get(
                "mfu_vs_v5e_bf16_peak"),
            "sweep": sweep,
            "multi_agent_batched": agents_sweep,
            "multi_agent_batched_oom_at": agents_oom_at,
            "saturated_batch_roofline": saturated_roofline,
            "saturated_batch_per_op_profile": saturated_ops,
            "numpy_backend_cand_evals_per_sec": measure_numpy_backend(),
            "device_resident_sim": device_sim,
            "device": str(jax.devices()[0]),
            "dtype": "float32",
        },
    }
    _append_history({
        "date": time.strftime("%Y-%m-%d"),
        "headline_p50_ms": result["detail"]["p50_cycle_latency_ms"],
        "headline_pass_spread_ms": result["detail"][
            "cycle_latency_pass_spread_ms"],
        "variant_spread_ms": result["detail"]["compile_variant_spread_ms"],
        "A128_batch_ms": next((r["p50_batch_latency_ms"] for r in agents_sweep
                               if r["agents"] == 128), None),
        "device_sim_wall_s": device_sim.get("wall_s_per_run"),
        "fleet8_wall_s": next((f["wall_s"] for f in device_sim.get("fleet", [])
                               if f["scenarios"] == 8), None),
        "timing": "fetch-synchronized",
    })
    print(json.dumps(result))


if __name__ == "__main__":
    main()
