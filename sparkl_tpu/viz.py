"""Headless particle visualization — PNG snapshots of simulation state.

Parity with the reference testbed's particle rendering
(ref: sparkl `src/third_party/rapier/testbed_plugin.rs:38-58`
ParticlesRenderingMode::{StaticColor, VelocityColor, DensityRatio, Position,
Blocks} and the instanced point-cloud renderer): the same coloring modes,
rendered to image files with matplotlib instead of a bevy window (TPU jobs
are headless). 3D scenes render an orthographic projection of a chosen axis
pair.

Usage:
    from sparkl_tpu import viz
    viz.render(particles, "frame.png", mode="velocity")
    viz.render_npz("out/frame_00010.npz", "f10.png", mode="phase")
"""

import numpy as np

MODES = ("static", "velocity", "density_ratio", "position", "phase", "blocks")


def _colors(p, mode, grid=None):
    import matplotlib

    act = np.asarray(p["active"]) if isinstance(p, dict) else np.asarray(p.active)
    get = (lambda k: np.asarray(p[k])) if isinstance(p, dict) else (
        lambda k: np.asarray(getattr(p, k))
    )
    pos = get("position")[act]
    if mode == "static":
        return pos, "#4878cf", None
    if mode == "velocity":
        v = np.linalg.norm(get("velocity")[act], axis=1)
        return pos, v, "viridis"
    if mode == "phase":
        return pos, get("phase")[act], "inferno"
    if mode == "density_ratio":
        try:
            f = get("deformation_gradient")[act]
            det = np.linalg.det(f)
        except (KeyError, AttributeError):
            det = np.ones(len(pos))
        return pos, np.clip(1.0 / np.maximum(det, 1e-6), 0.0, 3.0), "coolwarm"
    if mode == "position":
        c = (pos - pos.min(0)) / np.maximum(pos.max(0) - pos.min(0), 1e-9)
        if c.shape[1] == 2:
            c = np.concatenate([c, np.full((len(c), 1), 0.5)], axis=1)
        return pos, c[:, :3], None
    if mode == "blocks":
        # Color by owning 4^d block (ref: block-coloring debug view).
        if grid is None:
            raise ValueError("mode='blocks' needs grid=GridParams")
        from sparkl_tpu.sparse.blocks import BLOCK_SIDE

        cell = np.floor(
            (pos - np.asarray(grid.origin)) / grid.cell_width
        ).astype(int) // BLOCK_SIDE
        key = cell[:, 0]
        for ax in range(1, cell.shape[1]):
            key = key * 1000 + cell[:, ax]
        return pos, (key * 2654435761 % 997) / 997.0, "tab20"
    raise ValueError(f"unknown mode {mode}; choose from {MODES}")


def render(particles, path, mode="velocity", grid=None, axes=(0, 1), size=900, dpi=110, title=None, point_size=None):
    """Render particle state to a PNG. `particles` is a Particles pytree or a
    dict of arrays (e.g. a loaded snapshot npz)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pos, c, cmap = _colors(particles, mode, grid)
    xy = pos[:, list(axes)]
    span = max(xy.max(0)[0] - xy.min(0)[0], xy.max(0)[1] - xy.min(0)[1], 1e-6)
    if point_size is None:
        point_size = max(0.05, min(4.0, 4e5 / max(len(xy), 1) / span))

    fig, ax = plt.subplots(figsize=(size / dpi, size / dpi), dpi=dpi)
    sc = ax.scatter(
        xy[:, 0], xy[:, 1], c=c, cmap=cmap, s=point_size, linewidths=0,
        rasterized=True,
    )
    if cmap is not None:
        fig.colorbar(sc, ax=ax, fraction=0.04, pad=0.02)
    ax.set_aspect("equal")
    ax.set_xlabel("xyz"[axes[0]])
    ax.set_ylabel("xyz"[axes[1]])
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path


def render_npz(npz_path, out_path, **kw):
    """Render a snapshot written by the CLI runner (--out)."""
    data = dict(np.load(npz_path))
    return render(data, out_path, **kw)
