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
    max_grid_blocks = max(c.max_grid_blocks for c in cfgs)
    max_chunks = max(c.max_chunks for c in cfgs)
    c_sz = cfgs[0].chunk_size

    rows = L.Rows(dim)
    cpb = region_cells(dim) // (2 ** dim)  # cells per block = 4^d
    f_ch = 1 + dim  # node channels (no psi for sand)
    max_halo_blocks = 256

    # Halo merge per substep (per mesh axis, both directions, keys + rows).
    halo_msg = max_halo_blocks * (4 + f_ch * cpb * 4)  # bytes per message
    halo_bytes = 2 * 2 * halo_msg  # 2 directions x (send+recv counted once
    # per link) -> 2 messages traverse each boundary link per substep
    n_coll = 4 + 2  # 4 halo ppermutes + pmin dt + pmax resort flag
    t_comm = halo_bytes / BW_ICI + n_coll * L_COLL

    # Migration-epoch slot migration. Since round 4, ordinary drift resorts
    # are SHARD-LOCAL (no collective, no cross-shard stall — a quiet shard
    # never pays for a busy one's rebuild); only epochs with actual
    # emigrant slot rows pmax-synchronize, so f_res below bounds the
    # EPOCH rate (cross-tile advection), not the drift-resort rate.
    slot_row_bytes = (rows.nf * 4 + L.NI * 4) * c_sz
    mig_chunks = max(64, max_chunks // 16)  # boundary layer of chunks
    t_mig = mig_chunks * slot_row_bytes / BW_ICI + 2 * L_COLL

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

    # Efficiency vs measured single-chip substep times (BASELINE round 3).
    for t_sub_ms, label, f_res in ((10.5, "settled (resort ~1/50 substeps)", 0.02),
                                   (18.4, "falling (resort every substep)", 1.0)):
        t_chip = t_sub_ms / 1e3 / s_chips  # perfect N/S work split
        t_step = max(t_chip, t_comm) + f_res * t_mig
        eff = (t_sub_ms / 1e3) / (s_chips * t_step)
        print(f"  {label}: t_chip={t_chip*1e3:.2f} ms "
          f"t_step={t_step*1e3:.2f} ms  efficiency ~{eff*100:.0f}%")


if __name__ == "__main__":
    main()
