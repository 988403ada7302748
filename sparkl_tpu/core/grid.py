"""Grid containers.

`GridParams` is static scene geometry (origin / cell width / resolution).
`GridState` is the per-substep node field pytree — the functional equivalent
of the reference's double-buffered grid (ref: sparkl `src/dynamics/grid_node.rs`
GridNode {mass, momentum, velocity, psi_momentum, psi_mass}); instead of
swapping buffers (`cuda_mpm_pipeline.rs grid.swap_buffers()`), each substep
returns a fresh grid and XLA buffer donation reuses the memory.

The dense grid is the single-chip reference path (and is genuinely fast on
TPU for bounded domains); the block-sparse path lives in sparkl_tpu.sparse.
"""

from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class GridParams:
    """Static grid geometry. Node i sits at origin + i * cell_width."""

    origin: Tuple[float, ...]
    cell_width: float
    res: Tuple[int, ...]  # number of nodes per axis

    @property
    def dim(self) -> int:
        return len(self.res)

    @property
    def num_nodes(self) -> int:
        return int(np.prod(self.res))

    def node_positions(self):
        """[*res, d] world positions of every node."""
        axes = [
            self.origin[i] + np.arange(self.res[i], dtype=np.float32) * self.cell_width
            for i in range(self.dim)
        ]
        mesh = np.meshgrid(*axes, indexing="ij")
        return jnp.asarray(np.stack(mesh, axis=-1))

    @staticmethod
    def for_domain(lo, hi, cell_width, pad=4):
        """Grid covering [lo, hi] with `pad` extra cells on each side."""
        lo = np.asarray(lo, np.float64)
        hi = np.asarray(hi, np.float64)
        origin = np.floor(lo / cell_width).astype(np.int64) - pad
        top = np.ceil(hi / cell_width).astype(np.int64) + pad
        res = tuple(int(t - o + 1) for o, t in zip(origin, top))
        return GridParams(
            origin=tuple(float(o * cell_width) for o in origin),
            cell_width=float(cell_width),
            res=res,
        )


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GridState:
    def replace(self, **kw):
        from dataclasses import replace as _replace

        return _replace(self, **kw)

    mass: jax.Array  # [*res]
    momentum: jax.Array  # [*res, d]
    velocity: jax.Array  # [*res, d]
    psi_momentum: jax.Array  # [*res]
    psi_mass: jax.Array  # [*res]

    @staticmethod
    def zeros(params: GridParams, dtype=jnp.float32) -> "GridState":
        res = params.res
        d = params.dim
        return GridState(
            mass=jnp.zeros(res, dtype),
            momentum=jnp.zeros(res + (d,), dtype),
            velocity=jnp.zeros(res + (d,), dtype),
            psi_momentum=jnp.zeros(res, dtype),
            psi_mass=jnp.zeros(res, dtype),
        )


def stencil_offsets(dim: int) -> np.ndarray:
    """The 3^d quadratic-stencil offsets, canonical order
    (ref: src/geometry/mod.rs NBH_SHIFTS — order is an internal detail here
    since reductions are deterministic either way)."""
    rng = [0, 1, 2]
    if dim == 2:
        return np.array([[i, j] for i in rng for j in rng], np.int32)
    return np.array([[i, j, k] for i in rng for j in rng for k in rng], np.int32)
