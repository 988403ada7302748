"""Rigid colliders as analytic point-projection shapes.

TPU-first replacement for parry shape trait objects / BVH traversal
(ref: sparkl `src_kernels/gpu_collider.rs` GpuColliderShape::{Cuboid,
HeightField, Polyline, TriMesh} and `src/dynamics/solver/grid_update.rs`
which calls `shape.project_point(pos, solid=false)` per grid cell).

Every shape implements `project_point(points) -> (proj, is_inside)` where
`proj` is the closest point ON THE BOUNDARY (matching parry's solid=false
convention — the reference always projects onto the boundary so interior
cells get a meaningful outward direction) and `is_inside` flags containment.
All projections are vectorized over arbitrary leading axes of `points`.

Collider GEOMETRY is a trace-time constant (scenes have a static collider
set, like the reference's lazily-rebuilt CudaColliderSet), but POSES may be
runtime values: `project_point(points, pose=(translation, rotation))`
overrides the baked isometry with traced arrays, so animated/scripted
colliders run without re-jit (ref: the CPU solver reads the live rapier
ColliderSet pose every step, src/dynamics/solver/mls_solver.rs:7-9 +
grid_update.rs:82 `collider.position()`; the testbed passes
physics.colliders per frame, testbed_plugin.rs:452-456).
"""

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

CUBOID = 0
HALFSPACE = 1
BALL = 2
HEIGHTFIELD = 3
POLYLINE = 4
CAPSULE = 5
TRIMESH = 6


@dataclass(frozen=True)
class Collider:
    shape_type: int
    # Shape-specific geometry (numpy; becomes XLA constants under jit).
    data: tuple
    translation: np.ndarray
    rotation: np.ndarray  # [d, d]
    friction: float = 0.0
    # Per-collider overrides (ref: CudaColliderOptions, cuda_collider_set.rs:22-39).
    penalty_stiffness: float = 0.0
    boundary_handling: Optional[int] = None  # overrides SolverParameters when set
    # Invert containment: solid side becomes the exterior (ref:
    # CudaColliderOptions.flip_interior, cuda_collider_set.rs:26 — applied as
    # `proj.is_inside = !proj.is_inside` in gpu_collider.rs:64-66, and as the
    # above-surface-is-solid variant for heightfields, :82-88).
    flip_interior: bool = False

    def _pose(self, pose, dtype):
        """(translation [d], rotation [d, d]) — the baked constants, or the
        runtime `pose` override (traced arrays; animated colliders)."""
        if pose is None:
            return (
                jnp.asarray(self.translation, dtype),
                jnp.asarray(self.rotation, dtype),
            )
        t, r = pose
        return jnp.asarray(t, dtype), jnp.asarray(r, dtype)

    def to_local(self, p, pose=None):
        t, r = self._pose(pose, p.dtype)
        return (p - t) @ r  # @ r == @ (r.T).T

    def to_world(self, p_local, pose=None):
        t, r = self._pose(pose, p_local.dtype)
        return p_local @ r.T + t

    def project_point(self, points, pose=None):
        """Returns (closest boundary point [..., d], is_inside [...]).

        `pose=(translation, rotation)` overrides the baked isometry with
        runtime (traced) arrays — the moving-collider path."""
        p = self.to_local(points, pose)
        if self.shape_type == CUBOID:
            proj, inside = _project_cuboid(p, self.data[0])
        elif self.shape_type == HALFSPACE:
            proj, inside = _project_halfspace(p, self.data[0])
        elif self.shape_type == BALL:
            proj, inside = _project_ball(p, self.data[0])
        elif self.shape_type == HEIGHTFIELD:
            proj, inside = _project_heightfield(p, *self.data)
        elif self.shape_type == POLYLINE:
            proj, inside = _project_polyline(p, self.data[0])
        elif self.shape_type == CAPSULE:
            proj, inside = _project_capsule(p, *self.data)
        elif self.shape_type == TRIMESH:
            proj, inside = _project_trimesh(p, *self.data)
        else:
            raise ValueError(f"unknown shape {self.shape_type}")
        if self.flip_interior:
            inside = ~inside
        return self.to_world(proj, pose), inside


def _identity_pose(dim, translation=None, rotation=None):
    t = np.zeros(dim, np.float32) if translation is None else np.asarray(translation, np.float32)
    r = np.eye(dim, dtype=np.float32) if rotation is None else np.asarray(rotation, np.float32)
    return t, r


def cuboid(half_extents, translation=None, rotation=None, friction=0.0, **kw):
    """Axis-aligned box (in local frame). Ref: rapier ColliderBuilder::cuboid."""
    he = np.asarray(half_extents, np.float32)
    t, r = _identity_pose(len(he), translation, rotation)
    return Collider(CUBOID, (he,), t, r, friction, **kw)


def halfspace(normal, translation=None, friction=0.0, **kw):
    n = np.asarray(normal, np.float32)
    n = n / np.linalg.norm(n)
    t, r = _identity_pose(len(n), translation, None)
    return Collider(HALFSPACE, (n,), t, r, friction, **kw)


def ball(radius, translation=None, friction=0.0, **kw):
    t = np.asarray(translation, np.float32)
    return Collider(BALL, (float(radius),), t, np.eye(len(t), dtype=np.float32), friction, **kw)


def capsule(a, b, radius, friction=0.0, **kw):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    t, r = _identity_pose(len(a), None, None)
    return Collider(CAPSULE, (a, b, float(radius)), t, r, friction, **kw)


def heightfield(heights, scale, translation=None, rotation=None, friction=0.0, **kw):
    """Heightfield over the last horizontal axis/axes.

    2D: heights[nx] over x in [-sx/2, sx/2], y = h * sy.
    3D: heights[nx, nz] over (x, z) in [-sx/2, sx/2] x [-sz/2, sz/2], y = h * sy.
    Matches parry's heightfield parameterization used by the reference scenes
    (e.g. examples3d/sand3.rs:30-38).
    """
    h = np.asarray(heights, np.float32)
    s = np.asarray(scale, np.float32)
    dim = len(s)
    t, r = _identity_pose(dim, translation, rotation)
    return Collider(HEIGHTFIELD, (h, s), t, r, friction, **kw)


def trimesh(vertices, triangles, translation=None, rotation=None, friction=0.0,
            hashed=None, max_table_entries=1 << 22, **kw):
    """Closed triangle mesh collider with exact point-triangle projection.

    Ref: gpu_collider.rs GpuColliderShape::TriMesh (parry traverses a BVH on
    device). Two lookup modes:

      * brute force (small meshes, `hashed=False`): [points x T] projection +
        ray-parity containment — exact everywhere;
      * spatial hash (`hashed=True`; auto for T > 256): triangles binned into
        a uniform cell grid sized to the largest triangle AABB edge; queries
        project onto the 3^3 neighboring cells' candidates. Exact whenever
        the closest point lies within one hash cell of the query (which
        covers every node the grid-update boundary logic can act on); points
        with no nearby triangle report no contact, matching the reference's
        `project_point_with_max_dist` None (gpu_collider.rs:43-50).
        Containment uses the nearest triangle's normal (requires consistent
        outward winding, like any normal-based test).
    """
    v = np.asarray(vertices, np.float32)
    t = np.asarray(triangles, np.int64)
    tri = v[t]  # [T, 3, 3]
    tl, r = _identity_pose(3, translation, rotation)
    if hashed is None:
        hashed = tri.shape[0] > 256
    if not hashed:
        return Collider(TRIMESH, (tri, None), tl, r, friction, **kw)

    # Build the hash host-side (trace-time constant, like every collider).
    lo = tri.min(axis=(0, 1)) - 1e-4
    hi = tri.max(axis=(0, 1)) + 1e-4
    tri_lo = tri.min(axis=1)
    tri_hi = tri.max(axis=1)
    cell = float(np.max(tri_hi - tri_lo))  # largest triangle AABB edge
    cell = max(cell, float(np.max(hi - lo)) / 64.0)  # cap table size
    dims = np.maximum(np.ceil((hi - lo) / cell).astype(np.int64), 1)
    ncell = int(np.prod(dims))
    buckets = [[] for _ in range(ncell)]
    for tid in range(tri.shape[0]):
        c0 = np.floor((tri_lo[tid] - lo) / cell).astype(np.int64)
        c1 = np.floor((tri_hi[tid] - lo) / cell).astype(np.int64)
        c0 = np.clip(c0, 0, dims - 1)
        c1 = np.clip(c1, 0, dims - 1)
        for ix in range(c0[0], c1[0] + 1):
            for iy in range(c0[1], c1[1] + 1):
                for iz in range(c0[2], c1[2] + 1):
                    buckets[(ix * dims[1] + iy) * dims[2] + iz].append(tid)
    # Table width = the densest cell (vertex fans — e.g. sphere poles — can
    # be large); never drop triangles. Fall back to brute force only when the
    # table itself would be bigger than the mesh.
    depth = max(max((len(b) for b in buckets), default=1), 1)
    if ncell * depth > max_table_entries:
        return Collider(TRIMESH, (tri, None), tl, r, friction, **kw)
    table = np.full((ncell, depth), -1, np.int32)
    for ci, b in enumerate(buckets):
        table[ci, : len(b)] = b
    hash_data = (
        lo.astype(np.float32),
        np.float32(cell),
        tuple(int(d) for d in dims),
        table,
    )
    return Collider(TRIMESH, (tri, hash_data), tl, r, friction, **kw)


def polyline(points, translation=None, rotation=None, friction=0.0, closed=True, **kw):
    """2D polyline obstacle; `closed` loops the last point to the first.

    Ref: gpu_collider.rs `polyline_project_point` (distance + winding test).
    """
    pts = np.asarray(points, np.float32)
    if closed and not np.allclose(pts[0], pts[-1]):
        pts = np.concatenate([pts, pts[:1]], axis=0)
    t, r = _identity_pose(2, translation, rotation)
    return Collider(POLYLINE, (pts,), t, r, friction, **kw)


# ---------------------------------------------------------------------------
# Shape projections (local frame)
# ---------------------------------------------------------------------------


def _project_cuboid(p, half_extents):
    he = jnp.asarray(half_extents, p.dtype)
    clamped = jnp.clip(p, -he, he)
    outside = jnp.any(jnp.abs(p) > he, axis=-1)

    # Inside: snap the axis closest to a face.
    gap = he - jnp.abs(p)  # >= 0 inside
    axis = jnp.argmin(gap, axis=-1)
    snap = jnp.sign(p) * he
    onehot = jax_onehot(axis, p.shape[-1], p.dtype)
    inner = p * (1.0 - onehot) + snap * onehot
    proj = jnp.where(outside[..., None], clamped, inner)
    return proj, ~outside


def jax_onehot(idx, k, dtype):
    return (idx[..., None] == jnp.arange(k)).astype(dtype)


def _project_halfspace(p, normal):
    n = jnp.asarray(normal, p.dtype)
    d = jnp.sum(p * n, axis=-1)
    proj = p - d[..., None] * n
    return proj, d < 0.0


def _project_ball(p, radius):
    r = jnp.linalg.norm(p, axis=-1)
    safe = jnp.maximum(r, 1e-12)
    proj = p / safe[..., None] * radius
    # Center point: project to an arbitrary surface point.
    proj = jnp.where((r < 1e-12)[..., None], jnp.zeros_like(p).at[..., 0].set(radius), proj)
    return proj, r < radius


def _project_capsule(p, a, b, radius):
    a = jnp.asarray(a, p.dtype)
    b = jnp.asarray(b, p.dtype)
    ab = b - a
    t = jnp.clip(
        jnp.sum((p - a) * ab, axis=-1) / jnp.maximum(jnp.sum(ab * ab), 1e-12), 0.0, 1.0
    )
    c = a + t[..., None] * ab
    d = p - c
    r = jnp.linalg.norm(d, axis=-1)
    safe = jnp.maximum(r, 1e-12)
    proj = c + d / safe[..., None] * radius
    return proj, r < radius


def _project_heightfield(p, heights, scale):
    """Exact closest-point projection onto the triangulated heightfield.

    The surface is the piecewise-linear graph parry builds: in 2D, segments
    between consecutive samples; in 3D, each cell split into two triangles
    along its (i,k)->(i+1,k+1) diagonal. The query projects onto the exact
    geometry of the 3x3 cells around its horizontal position (18 triangles /
    3 segments) — exact wherever the closest point lies within one cell
    horizontally, which covers every node the grid-update boundary logic can
    act on (and matches a brute-force oracle in tests/test_scenes.py).
    Ref: src_kernels/gpu_collider.rs:43-95 (parry projects onto the exact
    triangles via BVH; the reference's terrain cells are grid-scale).

    Table lookups are one-hot reductions/matmuls instead of element gathers:
    XLA:TPU gathers cost ~8.5ns/element; the tables are tiny (~41 wide).
    """
    h = jnp.asarray(heights, p.dtype)
    s = jnp.asarray(scale, p.dtype)
    dim = p.shape[-1]
    if dim == 2:
        nx = h.shape[0]
        dx = s[0] / (nx - 1)
        # Local x in [-sx/2, sx/2] maps to [0, nx-1].
        u = (p[..., 0] / s[0] + 0.5) * (nx - 1)
        uc = jnp.clip(u, 0.0, nx - 1.000001)
        i0 = jnp.floor(uc).astype(jnp.int32)
        ids = jnp.arange(nx, dtype=jnp.int32)

        def corner(di):
            idx = jnp.clip(i0 + di, 0, nx - 1)
            oh = (ids == idx[..., None]).astype(p.dtype)
            hy = jnp.sum(oh * h, axis=-1) * s[1]
            x = (idx.astype(p.dtype) / (nx - 1) - 0.5) * s[0]
            return jnp.stack([x, hy], axis=-1)  # [..., 2]

        v = [corner(di) for di in range(-1, 3)]  # 4 corners -> 3 segments
        best_d2 = None
        best_proj = None
        for k in range(3):
            a, b = v[k], v[k + 1]
            ab = b - a
            t = jnp.sum((p - a) * ab, axis=-1) / jnp.maximum(
                jnp.sum(ab * ab, axis=-1), 1e-20
            )
            t = jnp.clip(t, 0.0, 1.0)
            cand = a + t[..., None] * ab
            d2 = jnp.sum((p - cand) ** 2, axis=-1)
            if best_d2 is None:
                best_d2, best_proj = d2, cand
            else:
                pick = d2 < best_d2
                best_d2 = jnp.where(pick, d2, best_d2)
                best_proj = jnp.where(pick[..., None], cand, best_proj)

        # Containment: below the (exact, piecewise-linear) surface.
        fu = uc - i0
        h0 = v[1][..., 1]
        h1 = v[2][..., 1]
        height = h0 * (1 - fu) + h1 * fu
        return best_proj, p[..., 1] < height
    else:
        nx, nz = h.shape
        lead = p.shape[:-1]
        pf = p.reshape(-1, 3)
        u = (pf[:, 0] / s[0] + 0.5) * (nx - 1)
        w = (pf[:, 2] / s[2] + 0.5) * (nz - 1)
        uc = jnp.clip(u, 0.0, nx - 1.000001)
        wc = jnp.clip(w, 0.0, nz - 1.000001)
        i0 = jnp.floor(uc).astype(jnp.int32)
        k0 = jnp.floor(wc).astype(jnp.int32)
        fu = uc - i0
        fw = wc - k0

        ix = jnp.arange(nx, dtype=jnp.int32)
        kz = jnp.arange(nz, dtype=jnp.int32)
        # 4 x-rows of the height table via MXU matmuls, then 4 z one-hots:
        # the 16 corner heights of the 3x3-cell neighborhood.
        rows = []
        for di in range(-1, 3):
            idx = jnp.clip(i0 + di, 0, nx - 1)
            oh = (ix == idx[:, None]).astype(pf.dtype)
            rows.append(jnp.dot(oh, h, preferred_element_type=pf.dtype))
        ohk = []
        for dk in range(-1, 3):
            kdx = jnp.clip(k0 + dk, 0, nz - 1)
            ohk.append((kz == kdx[:, None]).astype(pf.dtype))

        def vert(di, dk):
            idx = jnp.clip(i0 + di, 0, nx - 1)
            kdx = jnp.clip(k0 + dk, 0, nz - 1)
            hy = jnp.sum(rows[di + 1] * ohk[dk + 1], axis=-1) * s[1]
            x = (idx.astype(pf.dtype) / (nx - 1) - 0.5) * s[0]
            z = (kdx.astype(pf.dtype) / (nz - 1) - 0.5) * s[2]
            return jnp.stack([x, hy, z], axis=-1)  # [M, 3]

        verts = {(di, dk): vert(di, dk) for di in range(-1, 3) for dk in range(-1, 3)}

        # 9 cells x 2 triangles, split along the (i,k)->(i+1,k+1) diagonal.
        tris_a, tris_b, tris_c = [], [], []
        for di in range(-1, 2):
            for dk in range(-1, 2):
                v00 = verts[(di, dk)]
                v10 = verts[(di + 1, dk)]
                v01 = verts[(di, dk + 1)]
                v11 = verts[(di + 1, dk + 1)]
                tris_a += [v00, v00]
                tris_b += [v10, v11]
                tris_c += [v11, v01]
        a = jnp.stack(tris_a, axis=1)  # [M, 18, 3]
        b = jnp.stack(tris_b, axis=1)
        c = jnp.stack(tris_c, axis=1)

        pt = _point_triangle_closest(pf[:, None, :], a, b, c)  # [M, 18, 3]
        d2 = jnp.sum((pf[:, None, :] - pt) ** 2, axis=-1)
        # Branch-free min-select (argmin + take_along_axis gathers are slow).
        best_d2 = d2[:, 0]
        proj = pt[:, 0, :]
        for t in range(1, 18):
            pick = d2[:, t] < best_d2
            best_d2 = jnp.where(pick, d2[:, t], best_d2)
            proj = jnp.where(pick[:, None], pt[:, t, :], proj)

        # Containment: below the exact triangulated surface of the own cell.
        h00 = verts[(0, 0)][:, 1]
        h10 = verts[(1, 0)][:, 1]
        h01 = verts[(0, 1)][:, 1]
        h11 = verts[(1, 1)][:, 1]
        in_a = fu >= fw  # triangle (v00, v10, v11) of the split
        h_a = h00 + fu * (h10 - h00) + fw * (h11 - h10)
        h_b = h00 + fw * (h01 - h00) + fu * (h11 - h01)
        height = jnp.where(in_a, h_a, h_b)
        inside = pf[:, 1] < height
        return proj.reshape(lead + (3,)), inside.reshape(lead)


def _project_polyline(p, pts):
    """Closest point on a 2D polyline + even-odd inside test.

    Ref: gpu_collider.rs `polyline_project_point` (:99-201).
    """
    pts = jnp.asarray(pts, p.dtype)
    a = pts[:-1]  # [S, 2]
    b = pts[1:]
    ab = b - a  # [S, 2]
    ap = p[..., None, :] - a  # [..., S, 2]
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-20)
    t = jnp.clip(jnp.sum(ap * ab, axis=-1) / denom, 0.0, 1.0)
    closest = a + t[..., None] * ab  # [..., S, 2]
    d2 = jnp.sum((p[..., None, :] - closest) ** 2, axis=-1)
    best = jnp.argmin(d2, axis=-1)
    proj = jnp.take_along_axis(closest, best[..., None, None], axis=-2)[..., 0, :]

    # Even-odd crossing test with a +x ray.
    ya = a[..., 1]
    yb = b[..., 1]
    px = p[..., 0:1]
    py = p[..., 1:2]
    cond = (ya <= py) != (yb <= py)  # segment spans the ray's y
    xint = a[..., 0] + (py - ya) / jnp.where(
        jnp.abs(yb - ya) < 1e-20, 1e-20, yb - ya
    ) * (b[..., 0] - a[..., 0])
    crossings = jnp.sum((cond & (xint > px)).astype(jnp.int32), axis=-1)
    inside = (crossings % 2) == 1
    return proj, inside


def _point_triangle_closest(pf, a, b, c):
    """Ericson's point-triangle closest point, broadcast over [..., 3]."""
    ab = b - a
    ac = c - a
    ap = pf - a

    d1 = jnp.sum(ab * ap, axis=-1)
    d2 = jnp.sum(ac * ap, axis=-1)
    bp = pf - b
    d3 = jnp.sum(ab * bp, axis=-1)
    d4 = jnp.sum(ac * bp, axis=-1)
    cp = pf - c
    d5 = jnp.sum(ab * cp, axis=-1)
    d6 = jnp.sum(ac * cp, axis=-1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom_face = jnp.maximum(va + vb + vc, 1e-30)
    v_f = vb / denom_face
    w_f = vc / denom_face
    pt_face = a + v_f[..., None] * ab + w_f[..., None] * ac

    t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, 1e-30), 0.0, 1.0)
    pt_ab = a + t_ab[..., None] * ab
    t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, 1e-30), 0.0, 1.0)
    pt_ac = a + t_ac[..., None] * ac
    t_bc = jnp.clip(
        (d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), 1e-30), 0.0, 1.0
    )
    pt_bc = b + t_bc[..., None] * (c - b)

    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (~in_a) & (~in_b) & (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (~in_a) & (~in_c) & (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (~in_b) & (~in_c) & (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    pt = pt_face
    pt = jnp.where(on_bc[..., None], pt_bc, pt)
    pt = jnp.where(on_ac[..., None], pt_ac, pt)
    pt = jnp.where(on_ab[..., None], pt_ab, pt)
    pt = jnp.where(in_c[..., None], c + jnp.zeros_like(pt), pt)
    pt = jnp.where(in_b[..., None], b + jnp.zeros_like(pt), pt)
    pt = jnp.where(in_a[..., None], a + jnp.zeros_like(pt), pt)
    return pt


def _project_trimesh(p, tri, hash_data=None):
    """Closest point on a triangle soup.

    hash_data=None: brute force over [points x T] + even-odd ray containment
    (mesh must be closed). Otherwise: spatial-hash candidate lookup (see
    `trimesh`).
    """
    if hash_data is not None:
        return _project_trimesh_hashed(p, tri, *hash_data)
    tri = jnp.asarray(tri, p.dtype)  # [T, 3, 3]
    lead = p.shape[:-1]
    pf = p.reshape(-1, 1, 3)  # [M, 1, 3]
    a, b, c = tri[None, :, 0, :], tri[None, :, 1, :], tri[None, :, 2, :]
    ab = b - a
    ac = c - a

    pt = _point_triangle_closest(pf, a, b, c)  # [M, T, 3]

    d2_all = jnp.sum((pf - pt) ** 2, axis=-1)  # [M, T]
    best = jnp.argmin(d2_all, axis=-1)
    proj = jnp.take_along_axis(pt, best[:, None, None], axis=1)[:, 0, :]

    # Containment: +x ray parity (Moller-Trumbore, direction (1,0,0)).
    eps = 1e-12
    e1 = ab[0]
    e2 = ac[0]
    # h = dir x e2 with dir = (1,0,0) -> (0, -e2z, e2y)
    hx = jnp.zeros_like(e2[..., 0])
    hy = -e2[..., 2]
    hz = e2[..., 1]
    det = e1[..., 0] * hx + e1[..., 1] * hy + e1[..., 2] * hz
    ok = jnp.abs(det) > eps
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    sx = pf[:, 0, 0][:, None] - a[0][..., 0]
    sy = pf[:, 0, 1][:, None] - a[0][..., 1]
    sz = pf[:, 0, 2][:, None] - a[0][..., 2]
    u = (sx * hx + sy * hy + sz * hz) * inv_det
    # q = s x e1
    qx = sy * e1[..., 2] - sz * e1[..., 1]
    qy = sz * e1[..., 0] - sx * e1[..., 2]
    qz = sx * e1[..., 1] - sy * e1[..., 0]
    v = qx * inv_det  # dir . q with dir = (1,0,0)
    t_hit = (e2[..., 0] * qx + e2[..., 1] * qy + e2[..., 2] * qz) * inv_det
    hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t_hit > 0)
    inside = (jnp.sum(hit.astype(jnp.int32), axis=-1) % 2) == 1

    return proj.reshape(lead + (3,)), inside.reshape(lead)


def _project_trimesh_hashed(p, tri, lo, cell, dims, table):
    """Spatial-hash closest point: candidates from the 3^3 neighbor cells of
    the query's hash cell. Points with no nearby triangle report no contact
    (projection pushed far away), matching the reference's
    project_point_with_max_dist -> None (gpu_collider.rs:43-50)."""
    tri = jnp.asarray(tri, p.dtype)  # [T, 3, 3]
    table = jnp.asarray(table)  # [ncell, L]
    lo = jnp.asarray(lo, p.dtype)
    nl = table.shape[1]
    lead = p.shape[:-1]
    pf = p.reshape(-1, 3)
    m = pf.shape[0]

    ix = jnp.floor((pf - lo) / cell).astype(jnp.int32)  # [M, 3]
    offs = np.stack(
        np.meshgrid(*([[-1, 0, 1]] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3)
    nbr = ix[:, None, :] + jnp.asarray(offs, jnp.int32)[None, :, :]  # [M,27,3]
    dimv = jnp.asarray(dims, jnp.int32)
    ok = jnp.all((nbr >= 0) & (nbr < dimv), axis=-1)  # [M, 27]
    nbr = jnp.clip(nbr, 0, dimv - 1)
    flat = (nbr[..., 0] * dims[1] + nbr[..., 1]) * dims[2] + nbr[..., 2]
    cand = table[jnp.where(ok, flat, 0)]  # [M, 27, L]
    cand = jnp.where(ok[..., None], cand, -1).reshape(m, 27 * nl)

    safe = jnp.clip(cand, 0, tri.shape[0] - 1)
    a = tri[safe, 0, :]  # [M, 27L, 3]
    b = tri[safe, 1, :]
    c = tri[safe, 2, :]
    pt = _point_triangle_closest(pf[:, None, :], a, b, c)
    d2 = jnp.sum((pf[:, None, :] - pt) ** 2, axis=-1)
    d2 = jnp.where(cand >= 0, d2, jnp.inf)

    k = 27 * nl
    best_d2 = d2[:, 0]
    proj = pt[:, 0, :]
    best_a, best_b, best_c = a[:, 0, :], b[:, 0, :], c[:, 0, :]
    for t in range(1, k):
        pick = d2[:, t] < best_d2
        best_d2 = jnp.where(pick, d2[:, t], best_d2)
        proj = jnp.where(pick[:, None], pt[:, t, :], proj)
        best_a = jnp.where(pick[:, None], a[:, t, :], best_a)
        best_b = jnp.where(pick[:, None], b[:, t, :], best_b)
        best_c = jnp.where(pick[:, None], c[:, t, :], best_c)

    found = jnp.isfinite(best_d2)
    # Containment via the nearest triangle's (outward) normal.
    n = jnp.cross(best_b - best_a, best_c - best_a)
    inside = found & (jnp.sum((pf - proj) * n, axis=-1) < 0.0)
    # No nearby triangle: report no contact (projection far away).
    proj = jnp.where(found[:, None], proj, pf + 1.0e9)
    return proj.reshape(lead + (3,)), inside.reshape(lead)


@dataclass(frozen=True)
class ColliderSet:
    """Static tuple of colliders (ref: rapier ColliderSet / CudaColliderSet)."""

    colliders: Tuple[Collider, ...] = ()

    def __iter__(self):
        return iter(self.colliders)

    def __len__(self):
        return len(self.colliders)
