"""Analytic multi-chip scaling estimate for DomainFusedPipeline.

The driver validates multi-chip CORRECTNESS on a virtual CPU mesh
(__graft_entry__.dryrun_multichip); real multi-chip hardware is not
available in this environment. This script makes the per-chip THROUGHPUT
story a number instead of a vibe: it instantiates the real
DomainFusedPipeline config for a scene split over an S-way slab mesh,
counts the exact bytes each collective moves per substep, and combines
them with the measured single-chip substep time and v5e ICI parameters
into an efficiency estimate (appended to BASELINE.md by hand).

Model (per substep, 1D slab of size S; ref: the reference overlaps its
halo g2p2g on a second CUDA stream, cuda_mpm_pipeline.rs:407-533 — XLA
schedules our ppermutes asynchronously the same way, so the comm term is
a *ceiling*, not an additive cost):

  t_chip  = t_sub(N/S)                       measured single-chip scaling
  t_comm  = halo_bytes / BW_ici + n_coll * L_coll
  t_step ~= max(t_chip, t_comm) + f_resort * t_mig
  eff     = t_sub(N) / (S * t_step)

Usage:  python scripts/estimate_multichip.py [scene] [S]
(CPU-only; does not touch the TPU tunnel.)
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import sparkl_tpu.scenes as scenes
from sparkl_tpu.fused import layout as L
from sparkl_tpu.fused import structure as FS
from sparkl_tpu.sparse.blocks import region_cells

# v5e interconnect parameters (public: jax-ml.github.io/scaling-book; each
# chip has 4 ICI links, ~45 GB/s one-way each on v5e's 2D torus).
BW_ICI = 45e9  # bytes/s one-way per link
L_COLL = 5e-6  # per-collective launch/sync latency (conservative)


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "sand3"
    s_chips = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    b = scenes.build(scene)
    grid = b.grid
    dim = grid.dim
    pos = np.asarray(b.particles.position)
    act = np.asarray(b.particles.active)
    n = int(act.sum())

    # Per-shard slab calibration along x (what DomainFusedPipeline does).
    xs = pos[act, 0]
    qs = np.quantile(xs, np.linspace(0, 1, s_chips + 1))
    cfgs = []
    raw_chunks = []  # LIVE chunk counts (no slack/quantum — the skew input)
    bspace = FS.block_space_ob2(grid)
    origin = np.asarray(grid.origin, np.float64)
    for s in range(s_chips):
        # Half-open slabs: a particle exactly on an interior quantile edge
        # belongs to one shard only (lattice x-positions often coincide
        # with the edges, and double-counting inflates the byte estimates).
        hi = (pos[:, 0] <= qs[s + 1]) if s == s_chips - 1 \
            else (pos[:, 0] < qs[s + 1])
        m = act & (pos[:, 0] >= qs[s]) & hi
        if m.sum() == 0:
            continue
        cfgs.append(FS.calibrate_ob2(grid, pos, m))
        cc = np.round((pos[m] - origin) / grid.cell_width).astype(np.int64)
        bc = (cc - 2) // 4 + 1
        key = bc[:, 0]
        for ax in range(1, dim):
            key = key * bspace[ax] + bc[:, ax]
        _, counts = np.unique(key, return_counts=True)
        raw_chunks.append(int(np.sum(-(-counts // 128))))
    max_grid_blocks = max(c.max_grid_blocks for c in cfgs)
    max_chunks = max(c.max_chunks for c in cfgs)
    c_sz = cfgs[0].chunk_size

    rows = L.Rows(dim)
    cpb = region_cells(dim) // (2 ** dim)  # cells per block = 4^d
    f_ch = 1 + dim  # node channels (no psi for sand)
    max_halo_blocks = 256

    # Halo merge per substep (per mesh axis, both directions; round 5 packs
    # the block keys bit-cast into lane 0 of the row payload, so each
    # direction is ONE ppermute).
    halo_msg = max_halo_blocks * (4 + f_ch * cpb * 4)  # bytes per message
    halo_bytes = 2 * 2 * halo_msg  # 2 directions x (send+recv counted once
    # per link) -> 2 messages traverse each boundary link per substep
    # Round-5 collective count: 2 packed halo ppermutes + ONE pmin carrying
    # both the dt and the migration-epoch bit (the round-4 separate pmax is
    # folded in, fused/pipeline._step_body).
    n_coll = 2 + 1
    t_comm = halo_bytes / BW_ICI + n_coll * L_COLL

    # Migration-epoch slot migration. Since round 4, ordinary drift resorts
    # are SHARD-LOCAL (no collective, no cross-shard stall — a quiet shard
    # never pays for a busy one's rebuild); only epochs with actual
    # emigrant slot rows pmax-synchronize, so f_res below bounds the
    # EPOCH rate (cross-tile advection), not the drift-resort rate.
    slot_row_bytes = (rows.nf * 4 + L.NI * 4) * c_sz
    mig_chunks = max(64, max_chunks // 16)  # boundary layer of chunks
    t_mig = mig_chunks * slot_row_bytes / BW_ICI + 2 * L_COLL

    # Shard skew (VERDICT r4 item 8): every rendezvous runs at the SLOWEST
    # shard's pace. Two sources, both modeled from the real per-shard split:
    #   (a) live-chunk imbalance — the live gate makes a shard's kernel time
    #       proportional to ITS live chunks; quantile slabs equalize
    #       particles but not chunk counts (block fragmentation differs).
    #   (b) desynchronized shard-local resorts — a resorting shard arrives
    #       late at the next collective; neighbors stall for the resort.
    live_chunks = np.asarray(raw_chunks, np.float64)
    skew_frac = float(live_chunks.max() / live_chunks.mean() - 1.0)

    print(f"scene={scene}  N={n}  S={s_chips} (1D slab)")
    print(f"  per-shard cfg: chunks={max_chunks} C={c_sz} "
          f"grid_blocks={max_grid_blocks}")
    print(f"  halo message: {halo_msg/1e3:.1f} KB  "
          f"(H={max_halo_blocks} blocks x {f_ch}x{cpb} ch)")
    print(f"  halo bytes/substep/link: {halo_bytes/1e3:.1f} KB "
          f"-> {halo_bytes/BW_ICI*1e6:.1f} us at {BW_ICI/1e9:.0f} GB/s")
    print(f"  t_comm = {t_comm*1e6:.1f} us/substep "
          f"({n_coll} collectives x {L_COLL*1e6:.0f} us latency dominate)")
    print(f"  resort migration ceiling: {t_mig*1e6:.1f} us/resort "
          f"({mig_chunks} chunks x {slot_row_bytes/1e3:.1f} KB)")
    print(f"  live-chunk skew (max/mean - 1 over shards): {skew_frac*100:.1f}%")

    # Efficiency vs measured single-chip substep times (round 5:
    # 9.5 ms composed substep at sand3@1M falling, ~5 ms settled @500k).
    # Resort cost scales with the slot TABLE size: full resort ~11 ms at the
    # 500k config's 6656 chunks -> per-shard tables of `max_chunks`.
    # f_drift = shard-local drift-resort rate (stalls neighbors at the next
    # rendezvous); f_epoch = collective migration-epoch rate (cross-tile
    # advection only — slabs are along x, sand falls in y, so epochs are
    # rare even in the falling phase).
    t_resort_shard = 11.0e-3 * max_chunks / 6656.0
    # Single-chip resort cost for the SAME total table (the numerator must
    # carry the same amortized resort work as the denominator — at the
    # synchronized lower bound the term cancels exactly).
    total_chunks = float(live_chunks.sum()) * 1.4  # + calibration slack
    t_resort_one = 11.0e-3 * total_chunks / 6656.0
    for t_sub_ms, label, f_drift, f_epoch in (
        (5.0 * (n / 500_000.0), "settled", 0.02, 0.005),
        (9.5 * (n / 1_000_000.0), "falling", 0.3, 0.02),
    ):
        t_one = t_sub_ms / 1e3 + f_drift * t_resort_one
        t_chip = t_sub_ms / 1e3 / s_chips  # perfect N/S work split
        t_skew = skew_frac * t_chip
        # Desync-resort stall band: synchronized-drift lower bound (all
        # shards resort the same substep — the coherent-motion case — so
        # stalls overlap) to independent-resort upper bound.
        stall_lo = f_drift * t_resort_shard
        stall_hi = min(1.0, s_chips * f_drift) * t_resort_shard
        base = max(t_chip + t_skew, t_comm) + f_epoch * t_mig
        t_lo, t_hi = base + stall_lo, base + stall_hi
        eff_lo = t_one / (s_chips * t_hi)
        eff_hi = t_one / (s_chips * t_lo)
        print(f"  {label}: t_chip={t_chip*1e3:.2f} ms skew={t_skew*1e3:.2f} ms"
              f" resort_stall={stall_lo*1e3:.2f}-{stall_hi*1e3:.2f} ms"
              f" t_step={t_lo*1e3:.2f}-{t_hi*1e3:.2f} ms"
              f"  efficiency ~{eff_lo*100:.0f}-{eff_hi*100:.0f}%")


if __name__ == "__main__":
    main()
