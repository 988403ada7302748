"""Multi-chip block-sparse domain decomposition with halo exchange.

The TPU-native equivalent of the reference's multi-GPU pipeline
(ref: sparkl SURVEY §2.6 / `src/cuda/cuda_sparse_grid.rs:255-322` halo
tagging, `cuda_mpm_pipeline.rs:407-533` halo g2p2g + staged D2D copies +
`merge_halo_blocks` additive reduction): the grid's block space is split
into contiguous slabs of block columns along axis 0, one slab per device in
a 1D `Mesh`. Everything runs under one `shard_map`:

  * each device owns the particles inside its slab (fixed per-device
    capacity) and builds its own sparse block structure with GLOBAL block
    keys — cross-device identity is by key, not index;
  * after local P2G, the two boundary block columns are exchanged with
    `lax.ppermute` over ICI and merged additively by key match — each
    device then holds exact totals for every block its particles read, so
    grid update and G2P are purely local and bit-identical across devices;
  * dt is `lax.pmin`-reduced (the reference's cross-device fixed-point
    atomic min);
  * particles that advect across a slab boundary migrate by `ppermute` at
    the start of the next substep (CFL guarantees <= 1 cell of drift per
    substep, far less than the one-block halo depth).

Fixed-capacity send buffers (halo blocks, migrants) overflow into the same
host-side regrow-and-retry loop as the block tables.
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
from sparkl_tpu.sparse.pipeline import SparseMpmPipeline


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
    """SparseMpmPipeline sharded over slab domains on a 1D device mesh."""

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
        self.axis = axis
        self.n_shards = int(mesh.devices.size)
        self.max_halo_blocks = max_halo_blocks
        self.max_migrants = max_migrants
        self.max_ghosts = max_ghosts

        bspace = B._block_space(grid)
        self._bspace = bspace
        self._col_stride = int(np.prod(bspace[1:])) if len(bspace) > 1 else 1
        # Slab boundaries in block columns (axis 0): shard s owns columns
        # [col_bounds[s], col_bounds[s+1]). Uniform by default; rebalance()
        # re-splits them from the particle distribution.
        w = -(-bspace[0] // self.n_shards)
        self.col_bounds = np.minimum(
            np.arange(self.n_shards + 1, dtype=np.int32) * w, bspace[0]
        )

        super().__init__(grid, models, colliders, params, gravity, hooks, **kw)
        self._halo_fn = self._halo_exchange
        self._dt_reduce = lambda dt: jax.lax.pmin(dt, self.axis)
        self._migrate_fn = self._migrate
        self._pvary = lambda x: jax.lax.pcast(x, (self.axis,), to="varying")
        # pallas_call outputs inside shard_map must declare their mesh-axis
        # variance explicitly (ShapeDtypeStruct vma under check_vma).
        self._kernel_vma = (self.axis,)

    # -- shard helpers --------------------------------------------------------

    def shard_of_positions(self, position, active):
        """Owning shard id per particle (host or device side)."""
        key, ok = B.particle_block_key(self.grid, position, active)
        col = key // self._col_stride
        bounds = jnp.asarray(self.col_bounds[1:-1], jnp.int32)  # inner edges
        shard = jnp.searchsorted(bounds, col, side="right").astype(jnp.int32)
        return jnp.where(ok, shard, -1)

    def distribute(self, particles, capacity_per_shard=None):
        """Split a global particle set into the [S, cap] sharded layout and
        device_put it across the mesh (axis 0 = shard)."""
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
        sharding = NamedSharding(self.mesh, P(self.axis))
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
        sharded = jax.shard_map(
            self._sharded_step,
            mesh=self.mesh,
            in_specs=(P(self.axis),),
            out_specs=(P(self.axis), P(), P(), P()),
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
        overflow = jax.lax.pmax(overflow, self.axis)  # int32 flag bits
        peak = jax.lax.pmax(peak, self.axis)
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
            sharded = jax.shard_map(
                frames_body,
                mesh=self.mesh,
                in_specs=(P(self.axis),),
                out_specs=(P(self.axis), P(), P(), P()),
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

    def _block_col(self, keys):
        return keys // self._col_stride

    def _halo_exchange(self, node, structure):
        """Additive merge of boundary-column block rows with both neighbors.

        node: [MGB+1, F*cpb] local partial sums. For shard s owning columns
        [c0, c1): send partials of column c0 left, partials of column c1
        (corner spill) right; receive and key-match-add symmetric rows.
        """
        ax = self.axis
        cfg = self._cfg
        s_idx = jax.lax.axis_index(ax)
        bounds = jnp.asarray(self.col_bounds, jnp.int32)
        c0 = bounds[s_idx]
        c1 = bounds[s_idx + 1]

        keys = structure.grid_keys  # [MGB]
        cols = self._block_col(keys)
        valid = keys < jnp.int32(np.prod(self._bspace))
        rows = node[: cfg.max_grid_blocks]

        def extract(col):
            flags = valid & (cols == col)
            r, sel, take = _compact_rows(rows, flags, self.max_halo_blocks)
            k = keys[take]
            k = jnp.where(sel, k, jnp.int32(-1))
            r = r * sel[:, None]
            overflow = jnp.sum(flags.astype(jnp.int32)) > self.max_halo_blocks
            return k, r, overflow

    # send left: my partials of my first column; send right: my spill into
    # the right neighbor's first column.
        kl, rl, ovl = extract(c0)
        kr, rr, ovr = extract(c1)

        n_dev = self.n_shards
        right_perm = [(i, i + 1) for i in range(n_dev - 1)]
        left_perm = [(i + 1, i) for i in range(n_dev - 1)]

        # What I receive from the left neighbor: its spill into MY first
        # column (it sent "right"). From the right: its partials of ITS
        # first column == my spill column (it sent "left").
        recv_k_from_left = jax.lax.ppermute(kr, ax, right_perm)
        recv_r_from_left = jax.lax.ppermute(rr, ax, right_perm)
        recv_k_from_right = jax.lax.ppermute(kl, ax, left_perm)
        recv_r_from_right = jax.lax.ppermute(rl, ax, left_perm)

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
        return node, ovl | ovr

    # -- particle migration ----------------------------------------------------

    def _migrate(self, p):
        """Move particles whose base cell left this shard's slab to the
        owning neighbor (<= 1 column of drift per substep by CFL)."""
        ax = self.axis
        s_idx = jax.lax.axis_index(ax)
        target = self.shard_of_positions(p.position, p.active)
        stay = (target == s_idx) | (target < 0) | ~p.active
        go_left = p.active & (target >= 0) & (target < s_idx)
        go_right = p.active & (target >= 0) & (target > s_idx)

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
            overflow = jnp.sum(mask.astype(jnp.int32)) > cap
            return buf, overflow

        buf_l, ov_l = pack(go_left)
        buf_r, ov_r = pack(go_right)

        n_dev = self.n_shards
        right_perm = [(i, i + 1) for i in range(n_dev - 1)]
        left_perm = [(i + 1, i) for i in range(n_dev - 1)]
        recv_from_left = jax.tree_util.tree_map(
            lambda a: jax.lax.ppermute(a, ax, right_perm), buf_r
        )
        recv_from_right = jax.tree_util.tree_map(
            lambda a: jax.lax.ppermute(a, ax, left_perm), buf_l
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
            ok = buf["active"]
            dest = jnp.where(ok, dest, p.capacity)  # dump row
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
            reduce_fn=lambda g: jax.lax.psum(g, self.axis),
        )

    def _evolve_eigenerosion_p(self, p):
        """Distributed eigenerosion: exchange boundary-strip GHOST particles
        (position + m·psi + m of eligible particles within 2 cells of the
        slab boundary) with both neighbors via ppermute, then pool neighbor
        sums over the extended population. Ghost outputs are discarded; their
        contributions to local particles make the pooling exact across the
        boundary (ref: eigenerosion.rs pools over exact 3^d neighborhoods)."""
        from sparkl_tpu.sparse.neighbors import neighbor_pair_sums
        from sparkl_tpu.sparse.pipeline import OVERFLOW_TABLES, OVERFLOW_EIGEN

        ax = self.axis
        grid = self.grid
        h = grid.cell_width
        s_idx = jax.lax.axis_index(ax)
        bounds = jnp.asarray(self.col_bounds, jnp.int32)
        c0 = bounds[s_idx]
        c1 = bounds[s_idx + 1]
        x_lo = grid.origin[0] + c0.astype(jnp.float32) * B.BLOCK_SIDE * h
        x_hi = grid.origin[0] + c1.astype(jnp.float32) * B.BLOCK_SIDE * h

        eligible = (
            (p.crack_propagation_factor != 0.0) & (p.phase > 0.0)
            & ~p.failed & p.active
        )
        x = p.position[:, 0]
        strip_l = eligible & (x < x_lo + 2.0 * h)
        strip_r = eligible & (x >= x_hi - 2.0 * h)

        d = p.dim
        vals = jnp.stack([p.mass * p.psi_pos, p.mass], axis=-1)
        payload = jnp.concatenate(
            [p.position, vals, eligible[:, None].astype(jnp.float32)], axis=1
        )  # [N, d + 3]

        cap = self.max_ghosts

        def pack(mask):
            rows, sel, _ = _compact_rows(payload, mask, cap)
            rows = rows * sel[:, None]
            overflow = jnp.sum(mask.astype(jnp.int32)) > cap
            return rows, overflow

        send_l, ov_l = pack(strip_l)
        send_r, ov_r = pack(strip_r)

        n_dev = self.n_shards
        right_perm = [(i, i + 1) for i in range(n_dev - 1)]
        left_perm = [(i + 1, i) for i in range(n_dev - 1)]
        ghosts_from_left = jax.lax.ppermute(send_r, ax, right_perm)
        ghosts_from_right = jax.lax.ppermute(send_l, ax, left_perm)
        ghosts = jnp.concatenate([ghosts_from_left, ghosts_from_right], axis=0)

        pos_ext = jnp.concatenate([p.position, ghosts[:, :d]], axis=0)
        vals_ext = jnp.concatenate([vals, ghosts[:, d : d + 2]], axis=0)
        include_ext = jnp.concatenate(
            [eligible, ghosts[:, d + 2] != 0.0], axis=0
        )
        pooled_ext, bucket_ov = neighbor_pair_sums(
            grid, pos_ext, vals_ext, include_mask=include_ext,
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
            (ov_l | ov_r).astype(jnp.int32) * OVERFLOW_TABLES
            + bucket_ov.astype(jnp.int32) * OVERFLOW_EIGEN
        )
        return p, flags

    # -- load rebalancing ---------------------------------------------------------

    def rebalance(self, particles, capacity_per_shard=None, tolerance=2.0):
        """Re-split the slab boundaries so per-shard particle counts stay
        balanced (host-side, frame-boundary; ref: the reference has no
        rebalancing — its testbed caps at 1 GPU — this is the TPU-native
        scaling extension, SURVEY §2.6). Returns a re-distributed particle
        pytree; call between frames when a drifting pile skews the counts
        (e.g. when max/mean shard count exceeds `tolerance`).

        Recompiles the step on the new boundaries only when they changed.
        """
        import numpy as onp

        pos = onp.asarray(particles.position)
        act = onp.asarray(particles.active)
        key, ok = B.particle_block_key(self.grid, particles.position, particles.active)
        col = onp.asarray(key // self._col_stride)
        col = col[onp.asarray(ok)]
        ncols = self._bspace[0]
        hist = onp.bincount(col, minlength=ncols).astype(onp.int64)
        csum = onp.concatenate([[0], onp.cumsum(hist)])
        total = csum[-1]
        # Equal-count split points, snapped to column boundaries.
        bounds = [0]
        for sshard in range(1, self.n_shards):
            want = total * sshard / self.n_shards
            c = int(onp.searchsorted(csum, want))
            c = max(bounds[-1] + 1, min(c, ncols - (self.n_shards - sshard)))
            bounds.append(c)
        bounds.append(ncols)
        new_bounds = onp.asarray(bounds, onp.int32)
        if not onp.array_equal(new_bounds, self.col_bounds):
            self.col_bounds = new_bounds
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
