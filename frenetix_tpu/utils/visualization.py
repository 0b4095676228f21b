"""Matplotlib visualization of scenarios, candidates, predictions.

Feature parity with the reference's `visualize_agent_at_timestep` /
`visualize_multiagent_scenario_at_timestep` / final plots + GIF assembly
(/root/reference/cr_scenario_handler/utils/visualization.py:46-847):
lanelet network, ego + obstacle boxes, all candidate trajectories colored by
cost (feasible) / red (infeasible), prediction means with 1σ covariance
ellipses, reference path, executed history, per-run final plot, GIF.
"""
from __future__ import annotations

import os

import numpy as np

__all__ = [
    "plot_scenario_at_timestep",
    "plot_final",
    "plot_multiagent_overview",
    "make_gif",
]

# the one live window reused across frames when show=True
_live_fig = None


def _draw_lanelets(ax, scenario):
    for ll in scenario.lanelets.values():
        ax.fill(
            *ll.polygon.T, facecolor="#e8e8e8", edgecolor="none", zorder=0
        )
    for ll in scenario.lanelets.values():
        ax.plot(*ll.left_vertices.T, color="#555", lw=0.6, zorder=1)
        ax.plot(*ll.right_vertices.T, color="#555", lw=0.6, zorder=1)


def _vehicle_patch(ax, pos, theta, length, width, color, zorder=10, alpha=1.0):
    from matplotlib.patches import Rectangle
    from matplotlib.transforms import Affine2D

    rect = Rectangle(
        (-length / 2, -width / 2), length, width,
        facecolor=color, edgecolor="black", lw=0.5, zorder=zorder, alpha=alpha,
    )
    rect.set_transform(
        Affine2D().rotate(theta).translate(pos[0], pos[1]) + ax.transData
    )
    ax.add_patch(rect)


def _windshield_patch(ax, pos, theta, length, width, zorder=10):
    """Minimal vehicle 'icon' (visualization.yaml draw_icons): a darker
    windshield trapezoid on the front third of the body box — readable at
    overview zoom without the reference's per-pixel icon assets."""
    from matplotlib.patches import Polygon as MplPolygon

    ca, sa = np.cos(theta), np.sin(theta)
    rot = np.array([[ca, -sa], [sa, ca]])
    shape = np.array([
        [0.10 * length, 0.40 * width], [0.25 * length, 0.32 * width],
        [0.25 * length, -0.32 * width], [0.10 * length, -0.40 * width],
    ])
    ax.add_patch(MplPolygon(shape @ rot.T + np.asarray(pos), closed=True,
                            facecolor="#223344", alpha=0.8, zorder=zorder))


def _cov_ellipse(ax, mean, cov, color, n_sigma=1.0, alpha=0.25, zorder=5):
    from matplotlib.patches import Ellipse

    vals, vecs = np.linalg.eigh(cov)
    vals = np.maximum(vals, 1e-9)
    ang = np.degrees(np.arctan2(vecs[1, 1], vecs[0, 1]))
    e = Ellipse(mean, 2 * n_sigma * np.sqrt(vals[1]), 2 * n_sigma * np.sqrt(vals[0]),
                angle=ang, facecolor=color, alpha=alpha, zorder=zorder)
    ax.add_patch(e)


def plot_scenario_at_timestep(
    scenario, agents, t, *, cycle_result=None, matrix_mask=None, predictions=None,
    save_path=None, window=60.0, veh_length=4.508, veh_width=1.61, show_ref=True,
    visible_area=None, show_labels=True, draw_planning_problem=True,
    draw_icons=False, show=False,
):
    """One frame: scenario + agents + (optional) candidate set + predictions.

    cycle_result: a planner CycleResult to draw all candidates, colored by
    cost (the reference's draw_traj_set mode, visualization.py:236-340).
    visible_area: a sim.visible_area.VisibleArea to overlay the sensor's
    visible region (the reference's visible-area rendering).
    show_labels / draw_planning_problem / draw_icons mirror the
    visualization.yaml flags of the same names (goal regions as filled
    polygons; icons draw a windshield wedge on the vehicle box).
    `show` (visualization.yaml show_plots — the reference's live rendering,
    cr_scenario_handler/utils/visualization.py:46-234): draw on the current
    interactive backend and pause briefly instead of forcing Agg.
    """
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    global _live_fig
    if show and _live_fig is not None and plt.fignum_exists(_live_fig.number):
        # live mode keeps ONE window open across steps (the reference's
        # interactive rendering keeps its figure alive between frames)
        fig = _live_fig
        fig.clf()
        ax = fig.add_subplot(111)
    else:
        fig, ax = plt.subplots(figsize=(11, 9))
        if show:
            _live_fig = fig
    _draw_lanelets(ax, scenario)

    if visible_area is not None:
        from matplotlib.patches import Polygon as MplPolygon

        ax.add_patch(MplPolygon(
            visible_area.polygon(), closed=True, facecolor="#ffdd55",
            edgecolor="#bb9900", alpha=0.25, zorder=2,
        ))

    # planning problems: goal regions + initial states (visualization.yaml
    # draw_planning_problem; the reference renders them via commonroad's
    # MPRenderer)
    if draw_planning_problem:
        from matplotlib.patches import Polygon as MplPolygon

        for a in agents:
            for g in getattr(a.problem, "goals", []):
                if getattr(g, "position_shape", None) is not None:
                    ax.add_patch(MplPolygon(
                        np.asarray(g.position_shape), closed=True,
                        facecolor="#ccddaa", edgecolor="#558833", alpha=0.5,
                        zorder=3,
                    ))

    # scenario obstacles at t
    agent_ids = {a.id for a in agents}
    for ob in scenario.obstacles.values():
        if ob.obstacle_id in agent_ids:
            continue
        st = ob.state_at_time(t)
        if st is None:
            continue
        _vehicle_patch(ax, st.position, st.orientation, ob.length, ob.width,
                       "#4477aa", zorder=8)
        if draw_icons:
            _windshield_patch(ax, st.position, st.orientation, ob.length,
                              ob.width, zorder=9)
        if show_labels:
            ax.annotate(str(ob.obstacle_id), st.position, fontsize=7, zorder=20)

    # candidate fan of the first agent
    if cycle_result is not None:
        ro = cycle_result.rollout
        x = np.asarray(ro.x)
        y = np.asarray(ro.y)
        cost = np.asarray(cycle_result.cost)
        ok = np.asarray(cycle_result.selectable)
        mask = np.asarray(matrix_mask) if matrix_mask is not None else np.ones(len(x), bool)
        finite = cost[ok & mask]
        cmin, cmax = (finite.min(), finite.max()) if len(finite) else (0, 1)
        import matplotlib.cm as cm

        for i in range(len(x)):
            if not mask[i]:
                continue
            if ok[i]:
                c = cm.viridis(1 - (cost[i] - cmin) / max(cmax - cmin, 1e-9))
                ax.plot(x[i], y[i], color=c, lw=0.4, alpha=0.5, zorder=4)
            else:
                ax.plot(x[i], y[i], color="#cc3333", lw=0.25, alpha=0.15, zorder=3)
        best = int(cycle_result.best_idx)
        ax.plot(x[best], y[best], color="#00cc44", lw=2.0, zorder=12)

    # predictions (means + 1σ ellipses every 5th step)
    if predictions is not None:
        means = np.asarray(predictions["means"])
        covs = np.asarray(predictions["covs"])
        valid = np.asarray(predictions["valid"])
        for k in range(means.shape[0]):
            if not valid[k].any():
                continue
            n = int(valid[k].sum())
            ax.plot(means[k, :n, 0], means[k, :n, 1], color="#ee7733", lw=1.0, zorder=6)
            for j in range(0, n, 5):
                _cov_ellipse(ax, means[k, j], covs[k, j], "#ee7733")

    # agents: history + box + reference path
    colors = ["#228833", "#aa3377", "#66ccee", "#ccbb44", "#b86a22", "#994455"]
    center = None
    for idx, a in enumerate(agents):
        col = colors[idx % len(colors)]
        hist = np.array([s.position for s in a.record.states])
        ax.plot(hist[:, 0], hist[:, 1], color=col, lw=1.2, zorder=9)
        _vehicle_patch(ax, a.state.position, a.state.orientation,
                       veh_length, veh_width, col, zorder=11)
        if draw_icons:
            _windshield_patch(ax, a.state.position, a.state.orientation,
                              veh_length, veh_width, zorder=12)
        if show_labels:
            ax.annotate(str(a.id), a.state.position, fontsize=7, zorder=20)
        if show_ref and a.planner.ref_np is not None:
            ax.plot(*np.asarray(a.planner.ref_np.xy).T, "--", color=col,
                    lw=0.6, alpha=0.5, zorder=2)
        if center is None:
            center = a.state.position
    if center is not None:
        ax.set_xlim(center[0] - window, center[0] + window)
        ax.set_ylim(center[1] - window * 0.75, center[1] + window * 0.75)
    ax.set_aspect("equal")
    ax.set_title(f"{scenario.scenario_id} — t = {t}")
    if save_path:
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        fig.savefig(save_path, dpi=100, bbox_inches="tight")
        if not show:
            plt.close(fig)
            return save_path
    if show:
        try:
            plt.ion()
            fig.show()
            plt.pause(0.001)
        except Exception:
            pass  # headless backend — live display silently unavailable
        # the window stays open (reused next frame via _live_fig)
        if save_path:
            return save_path
    return fig, ax


def plot_final(scenario, result, save_path=None):
    """Whole-run overview: all executed trajectories (visualization.py:636-771)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 9))
    _draw_lanelets(ax, scenario)
    for aid, states in result.histories.items():
        xy = np.array([s.position for s in states])
        v = np.array([s.velocity for s in states])
        sc = ax.scatter(xy[:, 0], xy[:, 1], c=v, s=4, cmap="plasma", zorder=8)
        ax.annotate(str(aid), xy[0], fontsize=8, zorder=20)
    fig.colorbar(sc, ax=ax, label="v [m/s]", shrink=0.7)
    ax.set_aspect("equal")
    ax.set_title(f"{result.scenario_id} — final trajectories")
    if save_path:
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        fig.savefig(save_path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return save_path
    return fig, ax


def make_gif(frame_dir, out_path, fps=10):
    """Assemble PNG frames into a GIF (reference uses imageio; PIL here)."""
    from PIL import Image

    frames = sorted(
        os.path.join(frame_dir, f) for f in os.listdir(frame_dir) if f.endswith(".png")
    )
    if not frames:
        return None
    imgs = [Image.open(f) for f in frames]
    base = imgs[0]
    base.save(
        out_path, save_all=True, append_images=imgs[1:],
        duration=int(1000 / fps), loop=0,
    )
    return out_path


def plot_multiagent_overview(scenario, result, save_path=None, max_agents=11):
    """Multi-agent overview (reference visualization.py:463-771): one combined
    map plus a per-agent panel with its trajectory, final status and velocity
    profile."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    aids = list(result.histories.keys())[:max_agents]
    n = len(aids) + 1
    cols = min(n, 3)
    rows = (n + cols - 1) // cols
    fig, axs = plt.subplots(rows, cols, figsize=(6 * cols, 5 * rows))
    axs = np.atleast_1d(axs).ravel()

    # combined map
    ax = axs[0]
    _draw_lanelets(ax, scenario)
    cmap = plt.get_cmap("tab10")
    for k, aid in enumerate(aids):
        xy = np.array([s.position for s in result.histories[aid]])
        ax.plot(xy[:, 0], xy[:, 1], color=cmap(k % 10), lw=1.5, zorder=8,
                label=str(aid))
        ax.annotate(str(aid), xy[0], fontsize=7, zorder=20)
    ax.set_aspect("equal")
    ax.legend(fontsize=7, loc="best")
    ax.set_title(f"{result.scenario_id} — all agents")

    # per-agent panels
    for k, aid in enumerate(aids):
        ax = axs[k + 1]
        _draw_lanelets(ax, scenario)
        states = result.histories[aid]
        xy = np.array([s.position for s in states])
        v = np.array([s.velocity for s in states])
        pts = ax.scatter(xy[:, 0], xy[:, 1], c=v, s=5, cmap="plasma", zorder=8)
        fig.colorbar(pts, ax=ax, shrink=0.6, label="v [m/s]")
        status = result.agent_status.get(aid)
        msg = result.agent_messages.get(aid, "")
        ax.set_aspect("equal")
        ax.set_title(
            f"agent {aid}: {getattr(status, 'name', status)} ({msg})", fontsize=9
        )
        pad = 12.0
        ax.set_xlim(xy[:, 0].min() - pad, xy[:, 0].max() + pad)
        ax.set_ylim(xy[:, 1].min() - pad, xy[:, 1].max() + pad)
    for ax in axs[n:]:
        ax.axis("off")

    fig.suptitle(f"{result.scenario_id} — multi-agent overview")
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, dpi=100, bbox_inches="tight")
        plt.close(fig)
        return save_path
    return fig, axs
