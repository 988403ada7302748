"""Multi-chip block-sparse domain decomposition with halo exchange.

The TPU-native equivalent of the reference's multi-GPU pipeline
(ref: sparkl SURVEY §2.6 / `src/cuda/cuda_sparse_grid.rs:255-322` halo
tagging, `cuda_mpm_pipeline.rs:407-533` halo g2p2g + staged D2D copies +
`merge_halo_blocks` additive reduction): the grid's block space is split
into contiguous slabs of block columns along grid axis 0 (1D mesh) or into
a 2D grid of tiles (2D mesh over grid axes 0 and d-1). Everything runs
under one `shard_map`:

  * each device owns the particles inside its tile (fixed per-device
    capacity) and builds its own sparse block structure with GLOBAL block
    keys — cross-device identity is by key, not index;
  * after local P2G, boundary block layers are exchanged with `lax.ppermute`
    over ICI and merged additively by key match, one mesh axis at a time —
    the second axis forwards already-merged rows, so corner contributions
    arrive through the edge neighbors (standard additive-halo forwarding);
  * dt is `lax.pmin`-reduced (the reference's cross-device fixed-point
    atomic min);
  * particles that advect across a tile boundary migrate by `ppermute` at
    the start of the next substep, one axis hop at a time (CFL guarantees
    <= 1 cell of drift per substep, far less than the one-block halo depth).

Slab/tile boundaries are explicit per-axis bounds arrays; `rebalance()`
re-splits them from the particle distribution at frame boundaries. Fixed-
capacity send buffers (halo rows, migrants, damage ghosts) overflow into
the same host-side regrow-and-retry loop as the block tables.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sparkl_tpu.core.grid import GridParams
from sparkl_tpu.core.params import DamageModel, SolverParameters
from sparkl_tpu.sparse import blocks as B
from sparkl_tpu.sparse.pipeline import (
    SparseMpmPipeline,
    OVERFLOW_TABLES,
    OVERFLOW_EIGEN,
)


def _compact_rows(values, flags, capacity):
    """First-`capacity` rows of `values` where flags, in order. Returns
    (rows, k). Sort-based (no narrow scatters)."""
    n = flags.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    order = jnp.argsort(jnp.where(flags, pos, n + pos))
    take = order[: min(capacity, n)]
    if take.shape[0] < capacity:
        take = jnp.concatenate(
            [take, jnp.zeros((capacity - take.shape[0],), jnp.int32)]
        )
    k = jnp.sum(flags.astype(jnp.int32))
    sel = jnp.arange(capacity, dtype=jnp.int32) < k
    return values[take], sel, take


class DomainSparsePipeline(SparseMpmPipeline):
    """SparseMpmPipeline sharded over slab/tile domains on a 1D or 2D mesh.

    1D (default): `Mesh(devices, ("x",))` — slabs of block columns along
    grid axis 0. 2D: `Mesh(devices.reshape(a, b), ("x", "z"))` — tiles over
    grid axes 0 and d-1.
    """

    def __init__(
        self,
        grid: GridParams,
        models,
        colliders=(),
        params: SolverParameters = SolverParameters(),
        gravity=None,
        hooks=None,
        mesh: Optional[Mesh] = None,
        axis: str = "x",
        max_halo_blocks: int = 256,
        max_migrants: int = 4096,
        max_ghosts: int = 4096,
        **kw,
    ):
        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()), (axis,))
        self.mesh = mesh
        self.mesh_axes = tuple(mesh.axis_names)
        self.mesh_shape = tuple(int(mesh.shape[a]) for a in self.mesh_axes)
        self.axis = self.mesh_axes[0]  # kept for back-compat call sites
        self.n_shards = int(mesh.devices.size)
        self.max_halo_blocks = max_halo_blocks
        self.max_migrants = max_migrants
        self.max_ghosts = max_ghosts

        bspace = B._block_space(grid)
        self._bspace = bspace
        if len(self.mesh_axes) == 1:
            self.decomp_gaxes = (0,)
        elif len(self.mesh_axes) == 2:
            self.decomp_gaxes = (0, grid.dim - 1)
        else:
            raise ValueError("1D or 2D meshes only")
        # Per-grid-axis block-key strides.
        self._strides = tuple(
            int(np.prod(bspace[g + 1 :])) if g + 1 < len(bspace) else 1
            for g in range(len(bspace))
        )
        # Per-mesh-axis tile boundaries in block coordinates: mesh axis i's
        # shard s owns block coords [bounds[i][s], bounds[i][s+1]) along
        # decomp_gaxes[i]. Uniform by default; rebalance() re-splits.
        self.bounds = []
        for g, size in zip(self.decomp_gaxes, self.mesh_shape):
            w = -(-bspace[g] // size)
            self.bounds.append(
                np.minimum(np.arange(size + 1, dtype=np.int32) * w, bspace[g])
            )

        super().__init__(grid, models, colliders, params, gravity, hooks, **kw)
        self._halo_fn = self._halo_exchange
        self._dt_reduce = lambda dt: jax.lax.pmin(dt, self.mesh_axes)
        self._migrate_fn = self._migrate
        self._pvary = lambda x: jax.lax.pcast(x, self.mesh_axes, to="varying")
        # pallas_call outputs inside shard_map must declare their mesh-axis
        # variance explicitly (ShapeDtypeStruct vma under check_vma).
        self._kernel_vma = self.mesh_axes

    # -- shard helpers --------------------------------------------------------

    def _block_coord(self, keys, g):
        """Block coordinate along grid axis g from linear keys."""
        return (keys // self._strides[g]) % self._bspace[g]

    def _axis_shard_of(self, keys, i):
        """Owning shard index along mesh axis i per block key."""
        coord = self._block_coord(keys, self.decomp_gaxes[i])
        inner = jnp.asarray(self.bounds[i][1:-1], jnp.int32)
        return jnp.searchsorted(inner, coord, side="right").astype(jnp.int32)

    def shard_of_positions(self, position, active):
        """Owning flat shard id per particle (host or device side)."""
        key, ok = B.particle_block_key(self.grid, position, active)
        flat = jnp.zeros(key.shape, jnp.int32)
        for i in range(len(self.mesh_axes)):
            flat = flat * self.mesh_shape[i] + self._axis_shard_of(key, i)
        return jnp.where(ok, flat, -1)

    def _my_flat_shard(self):
        flat = jnp.asarray(0, jnp.int32)
        for i, a in enumerate(self.mesh_axes):
            flat = flat * self.mesh_shape[i] + jax.lax.axis_index(a)
        return flat

    def distribute(self, particles, capacity_per_shard=None):
        """Split a global particle set into the [S, cap] sharded layout and
        device_put it across the mesh (leading dim = flattened mesh)."""
        import numpy as onp
        from sparkl_tpu.core.particles import Particles

        shard = onp.asarray(self.shard_of_positions(particles.position, particles.active))
        act = onp.asarray(particles.active)
        shard = onp.where(act, shard, -1)
        counts = [(shard == s).sum() for s in range(self.n_shards)]
        cap = capacity_per_shard or int(max(counts) * 1.5) + self.max_migrants
        out = {}
        for name in particles.__dataclass_fields__:
            src = onp.array(onp.asarray(getattr(particles, name)))
            dstshape = (self.n_shards, cap) + src.shape[1:]
            tmpl = onp.asarray(getattr(Particles.empty(1, self.grid.dim), name))
            dst = onp.broadcast_to(tmpl[:1], dstshape).copy()
            for s in range(self.n_shards):
                sel = onp.nonzero(shard == s)[0]
                dst[s, : len(sel)] = src[sel]
            out[name] = jnp.asarray(dst.reshape((self.n_shards * cap,) + src.shape[1:]))
        p = Particles(**out)
        sharding = NamedSharding(self.mesh, P(self.mesh_axes))
        return jax.device_put(p, sharding)

    def _ensure_cfg(self, p):
        if self._cfg is None:
            # Calibrate per-shard: each device sees capacity/S particles.
            import numpy as onp

            pos = onp.asarray(p.position)
            act = onp.asarray(p.active)
            per = pos.shape[0] // self.n_shards
            cfgs = []
            for s in range(self.n_shards):
                sl = slice(s * per, (s + 1) * per)
                if act[sl].any():
                    cfgs.append(
                        B.BlockConfig.calibrate(self.grid, pos[sl], act[sl])
                    )
            self._cfg = B.BlockConfig(
                max_blocks=max(c.max_blocks for c in cfgs),
                max_chunks=max(c.max_chunks for c in cfgs),
                chunk_size=cfgs[0].chunk_size,
                max_grid_blocks=max(c.max_grid_blocks for c in cfgs),
            )
        if self._jit is None:
            self._ensure_cfg_jit_only()

    def _grow(self, factor=1.6):
        # The overflow bit is shared between the block tables, the halo-row
        # buffer, and the migration buffer (they are all fixed-capacity) —
        # grow all three, since the flag does not say which one tripped.
        super()._grow(factor)
        self.max_halo_blocks = int(self.max_halo_blocks * factor) + 64
        self.max_migrants = int(self.max_migrants * factor) + 64
        self.max_ghosts = int(self.max_ghosts * factor) + 64
        self._jit = None
        self._ensure_cfg_jit_only()

    def _ensure_cfg_jit_only(self):
        spec = P(self.mesh_axes)
        sharded = jax.shard_map(
            self._sharded_step,
            mesh=self.mesh,
            in_specs=(spec,),
            out_specs=(spec, P(), P(), P()),
        )
        self._jit = jax.jit(sharded)

    def _recalibrate(self, p):
        # Domain path: re-run the per-shard calibration (max over shards).
        self._cfg = None
        self._jit = None
        self._jit_frames = {}
        self._low_use_frames = 0
        self._ensure_cfg(p)

    def _sharded_step(self, p):
        p, niter, overflow, peak = self._step_impl(p)
        overflow = jax.lax.pmax(overflow, self.mesh_axes)  # int32 flag bits
        peak = jax.lax.pmax(peak, self.mesh_axes)
        return p, niter, overflow, peak

    def run_frames(
        self, particles, num_frames: int, frames_per_launch: int | None = None
    ):
        """Sharded multi-frame span (the inherited version would jit the
        unsharded step; collectives need the shard_map context)."""
        if frames_per_launch is not None and frames_per_launch < num_frames:
            total = 0
            done = 0
            while done < num_frames:
                k = min(frames_per_launch, num_frames - done)
                particles, t = self.run_frames(particles, k)
                total += int(t)
                done += k
            return particles, total
        self._ensure_cfg(particles)
        if not hasattr(self, "_jit_frames"):
            self._jit_frames = {}
        key = (num_frames, self._cfg)

        def frames_body(p):
            def body(carry, _):
                p, total, ov, peak = carry
                p, niter, ov2, pk = self._sharded_step(p)
                return (
                    p,
                    total + niter,
                    ov | ov2,
                    jnp.maximum(peak, pk),
                ), None

            (p, total, ov, peak), _ = jax.lax.scan(
                body,
                (p, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
                 jnp.asarray(0, jnp.int32)),
                None,
                length=num_frames,
            )
            return p, total, ov, peak

        if key not in self._jit_frames:
            spec = P(self.mesh_axes)
            sharded = jax.shard_map(
                frames_body,
                mesh=self.mesh,
                in_specs=(spec,),
                out_specs=(spec, P(), P(), P()),
            )
            self._jit_frames[key] = jax.jit(sharded)
        for _attempt in range(6):
            p, total, overflow, peak = self._jit_frames[key](particles)
            flags = int(overflow)
            if flags == 0:
                self._adapt_capacity(int(peak), p)
                return p, total
            self._handle_overflow(flags)
            key = (num_frames, self._cfg)
        raise RuntimeError("block table capacity still overflowing after regrows")

    # -- halo exchange ---------------------------------------------------------

    def _neighbor_perms(self, i):
        """ppermute pairs along mesh axis i (non-circular)."""
        size = self.mesh_shape[i]
        right = [(k, k + 1) for k in range(size - 1)]
        left = [(k + 1, k) for k in range(size - 1)]
        return right, left

    def _halo_exchange(self, node, structure):
        """Additive merge of boundary block layers with neighbors, one mesh
        axis at a time. The second axis sends rows that already include the
        first axis's merged contributions, so corner blocks accumulate all
        four quadrants' partials (additive-halo forwarding).

        node: [MGB+1, F*cpb] local partial sums.
        """
        cfg = self._cfg
        keys = structure.grid_keys  # [MGB]
        valid = keys < jnp.int32(np.prod(self._bspace))
        overflow = jnp.asarray(False)

        for i, a in enumerate(self.mesh_axes):
            g = self.decomp_gaxes[i]
            s_idx = jax.lax.axis_index(a)
            bounds = jnp.asarray(self.bounds[i], jnp.int32)
            c0 = bounds[s_idx]
            c1 = bounds[s_idx + 1]
            coords = self._block_coord(keys, g)
            rows = node[: cfg.max_grid_blocks]

            def extract(layer):
                flags = valid & (coords == layer)
                r, sel, take = _compact_rows(rows, flags, self.max_halo_blocks)
                k = keys[take]
                k = jnp.where(sel, k, jnp.int32(-1))
                r = r * sel[:, None]
                ovf = jnp.sum(flags.astype(jnp.int32)) > self.max_halo_blocks
                return k, r, ovf

            # send left: my partials of my first layer; send right: my spill
            # into the right neighbor's first layer.
            kl, rl, ovl = extract(c0)
            kr, rr, ovr = extract(c1)

            right_perm, left_perm = self._neighbor_perms(i)
            recv_k_from_left = jax.lax.ppermute(kr, a, right_perm)
            recv_r_from_left = jax.lax.ppermute(rr, a, right_perm)
            recv_k_from_right = jax.lax.ppermute(kl, a, left_perm)
            recv_r_from_right = jax.lax.ppermute(rl, a, left_perm)

            def merge(node_rows, rk, rr_):
                rk_safe = jnp.where(rk >= 0, rk, jnp.int32(2**30))
                idx = jnp.searchsorted(keys, rk_safe).astype(jnp.int32)
                idx = jnp.clip(idx, 0, cfg.max_grid_blocks - 1)
                hit = (keys[idx] == rk_safe) & (rk >= 0)
                dest = jnp.where(hit, idx, cfg.max_grid_blocks)
                return node_rows.at[dest].add(rr_ * hit[:, None])

            node = merge(node, recv_k_from_left, recv_r_from_left)
            node = merge(node, recv_k_from_right, recv_r_from_right)
            node = node.at[cfg.max_grid_blocks].set(0.0)
            overflow = overflow | ovl | ovr
        return node, overflow

    # -- particle migration ----------------------------------------------------

    def _migrate(self, p):
        """Move particles whose base cell left this shard's tile to the
        owning neighbor, one mesh-axis hop at a time (diagonal migrants take
        two hops within the same substep; <= 1 cell of drift by CFL)."""
        overflow = jnp.asarray(False)
        for i, a in enumerate(self.mesh_axes):
            p, ov = self._migrate_axis(p, i, a)
            overflow = overflow | ov
        return p, overflow

    def _migrate_axis(self, p, i, a):
        s_idx = jax.lax.axis_index(a)
        key, ok = B.particle_block_key(self.grid, p.position, p.active)
        target = self._axis_shard_of(key, i)
        valid = ok & p.active
        go_left = valid & (target < s_idx)
        go_right = valid & (target > s_idx)

        cap = self.max_migrants
        fields = list(p.__dataclass_fields__)

        def pack(mask):
            n = mask.shape[0]
            pos = jnp.arange(n, dtype=jnp.int32)
            order = jnp.argsort(jnp.where(mask, pos, n + pos))
            take = order[:cap]
            sel = jnp.arange(cap, dtype=jnp.int32) < jnp.sum(mask.astype(jnp.int32))
            buf = {f: getattr(p, f)[take] for f in fields}
            buf["active"] = buf["active"] & sel
            ovf = jnp.sum(mask.astype(jnp.int32)) > cap
            return buf, ovf

        buf_l, ov_l = pack(go_left)
        buf_r, ov_r = pack(go_right)

        right_perm, left_perm = self._neighbor_perms(i)
        recv_from_left = jax.tree_util.tree_map(
            lambda x: jax.lax.ppermute(x, a, right_perm), buf_r
        )
        recv_from_right = jax.tree_util.tree_map(
            lambda x: jax.lax.ppermute(x, a, left_perm), buf_l
        )

        # Drop emigrants locally.
        active = p.active & ~(go_left | go_right)
        p = p.replace(active=active)

        # Insert immigrants into free slots (sorted so inactive come first).
        def insert(p, buf, ov):
            free_order = jnp.argsort(p.active)  # inactive slots first
            n_imm = jnp.sum(buf["active"].astype(jnp.int32))
            n_free = jnp.sum((~p.active).astype(jnp.int32))
            dest = free_order[:cap]
            okb = buf["active"]
            dest = jnp.where(okb, dest, p.capacity)  # dump row
            upd = {}
            for f in fields:
                arr = getattr(p, f)
                pad = jnp.zeros((1,) + arr.shape[1:], arr.dtype)
                ext = jnp.concatenate([arr, pad], axis=0)
                ext = ext.at[dest].set(buf[f])
                upd[f] = ext[:-1]
            return p.__class__(**upd), ov | (n_imm > n_free)

        p, ov1 = insert(p, recv_from_left, ov_l | ov_r)
        p, ov2 = insert(p, recv_from_right, jnp.asarray(False))
        return p, ov1 | ov2

    # -- cross-device damage -----------------------------------------------------

    def _update_phase_field_p(self, p, dt):
        """Distributed CD-MPM: every shard scatters its particles into the
        dense CG grids, partial grids are psum-reduced (one reduction per CG
        iteration for the matrix-free A·p), and each shard then runs an
        identical CG — exact, not an approximation. The reference never runs
        CD-MPM beyond one GPU (SURVEY §2.6); this is the TPU extension."""
        from sparkl_tpu.solver.phase_field import update_phase_field

        return update_phase_field(
            self.grid, p, self.models, dt,
            reduce_fn=lambda g: jax.lax.psum(g, self.mesh_axes),
        )

    def _evolve_eigenerosion_p(self, p):
        """Distributed eigenerosion: exchange boundary-strip GHOST particles
        (position + m·psi + m of eligible particles within 2 cells of the
        tile boundary) with neighbors via ppermute — per mesh axis, with the
        second axis forwarding first-axis ghosts so diagonal neighborhoods
        pool exactly. Ghost outputs are discarded; their contributions to
        local particles make the pooling exact across boundaries
        (ref: eigenerosion.rs pools over exact 3^d neighborhoods)."""
        from sparkl_tpu.sparse.neighbors import neighbor_pair_sums

        grid = self.grid
        h = grid.cell_width
        d = p.dim
        eligible = (
            (p.crack_propagation_factor != 0.0) & (p.phase > 0.0)
            & ~p.failed & p.active
        )
        vals = jnp.stack([p.mass * p.psi_pos, p.mass], axis=-1)
        payload = jnp.concatenate(
            [p.position, vals, eligible[:, None].astype(jnp.float32)], axis=1
        )  # [N, d + 3]

        cap = self.max_ghosts
        strip_ov = jnp.asarray(False)
        ext = payload

        for i, a in enumerate(self.mesh_axes):
            g = self.decomp_gaxes[i]
            s_idx = jax.lax.axis_index(a)
            bounds = jnp.asarray(self.bounds[i], jnp.int32)
            x_lo = grid.origin[g] + bounds[s_idx].astype(jnp.float32) * B.BLOCK_SIDE * h
            x_hi = grid.origin[g] + bounds[s_idx + 1].astype(jnp.float32) * B.BLOCK_SIDE * h

            x = ext[:, g]
            inc = ext[:, d + 2] != 0.0
            strip_l = inc & (x < x_lo + 2.0 * h)
            strip_r = inc & (x >= x_hi - 2.0 * h)

            def pack(mask):
                rows, sel, _ = _compact_rows(ext, mask, cap)
                rows = rows * sel[:, None]
                ovf = jnp.sum(mask.astype(jnp.int32)) > cap
                return rows, ovf

            send_l, ov_l = pack(strip_l)
            send_r, ov_r = pack(strip_r)
            strip_ov = strip_ov | ov_l | ov_r

            right_perm, left_perm = self._neighbor_perms(i)
            ghosts_from_left = jax.lax.ppermute(send_r, a, right_perm)
            ghosts_from_right = jax.lax.ppermute(send_l, a, left_perm)
            ext = jnp.concatenate(
                [ext, ghosts_from_left, ghosts_from_right], axis=0
            )

        pooled_ext, bucket_ov = neighbor_pair_sums(
            grid, ext[:, :d], ext[:, d : d + 2],
            include_mask=ext[:, d + 2] != 0.0,
            radius=h, max_per_cell=self._eigen_k,
        )
        pooled = pooled_ext[: p.capacity]

        parameter1 = p.parameter1 + jnp.where(eligible, pooled[:, 0], 0.0)
        parameter2 = p.parameter2 + jnp.where(eligible, pooled[:, 1], 0.0)
        has_crack = p.crack_propagation_factor != 0.0
        safe2 = jnp.where(parameter2 > 0.0, parameter2, 1.0)
        energy = parameter1 * p.crack_propagation_factor * h / safe2
        trip = has_crack & (energy > p.crack_threshold)
        p = p.replace(
            parameter1=jnp.where(has_crack, energy, parameter1),
            phase=jnp.where(trip, 0.0, p.phase),
        )
        # Strip-buffer overflow regrows tables (max_ghosts grows with them);
        # bucket overflow regrows the eigenerosion bucket depth.
        flags = (
            strip_ov.astype(jnp.int32) * OVERFLOW_TABLES
            + bucket_ov.astype(jnp.int32) * OVERFLOW_EIGEN
        )
        return p, flags

    # -- load rebalancing ---------------------------------------------------------

    def rebalance(self, particles, capacity_per_shard=None):
        """Re-split the tile boundaries so per-shard particle counts stay
        balanced (host-side, frame-boundary; ref: the reference has no
        rebalancing — its testbed caps at 1 GPU — this is the TPU-native
        scaling extension, SURVEY §2.6). Returns a re-distributed particle
        pytree. Recompiles the step only when the boundaries changed.

        Per-axis marginal equal-count splits (exact for 1D; a good heuristic
        for 2D tiles)."""
        import numpy as onp

        key, ok = B.particle_block_key(self.grid, particles.position, particles.active)
        key = onp.asarray(key)[onp.asarray(ok)]
        changed = False
        for i, g in enumerate(self.decomp_gaxes):
            coord = (key // self._strides[g]) % self._bspace[g]
            ncols = self._bspace[g]
            size = self.mesh_shape[i]
            hist = onp.bincount(coord, minlength=ncols).astype(onp.int64)
            csum = onp.concatenate([[0], onp.cumsum(hist)])
            total = csum[-1]
            bounds = [0]
            for sshard in range(1, size):
                want = total * sshard / size
                c = int(onp.searchsorted(csum, want))
                c = max(bounds[-1] + 1, min(c, ncols - (size - sshard)))
                bounds.append(c)
            bounds.append(ncols)
            nb = onp.asarray(bounds, onp.int32)
            if not onp.array_equal(nb, self.bounds[i]):
                self.bounds[i] = nb
                changed = True
        if changed:
            self._jit = None
            self._jit_frames = {}
            self._ensure_cfg_jit_only()
        return self.distribute(particles, capacity_per_shard)

    def shard_counts(self, particles):
        """Per-shard active-particle counts (host-side diagnostics)."""
        import numpy as onp

        shard = onp.asarray(
            self.shard_of_positions(particles.position, particles.active)
        )
        return onp.asarray(
            [(shard == sidx).sum() for sidx in range(self.n_shards)]
        )
