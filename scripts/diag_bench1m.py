"""Diagnose the bench-shape (sand3 @1M, falling phase) substep cost.

The 500k settled profile says 6.5 ms/substep, but bench.py measures ~93
ms/substep at 1M during the falling phase. This script localizes the gap:
wall time per substep over the measured span, resorts per substep, then
per-stage substep + resort profiles at the FALLEN state (the state the
bench actually measures, not the initial packing).

Usage: python scripts/diag_bench1m.py [frames]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/tmp/jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import numpy as np

import sparkl_tpu.scenes as scenes
from sparkl_tpu.fused.pipeline import FusedMpmPipeline
from sparkl_tpu.utils.timings import profile_fused_substep, profile_resort


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    b = scenes.build("sand3", nx=100, ny=50, nz=100)  # bench.py "full" shape
    pipe = FusedMpmPipeline(
        b.grid, b.models, b.colliders, b.params, b.gravity, b.hooks
    )
    p = b.particles
    n = int(np.asarray(p.num_active))
    print(f"n_active={n}", flush=True)

    # State-resident spans, exactly what bench.py measures since round 4:
    # pack once, advance resident slot state (run_frames would re-pack and
    # re-unpack EVERY span — ~3.3 s of op-by-op dispatches at 1M, the round-3
    # bench bug).
    state = pipe.pack_state(p)
    state, _ = pipe.run_frames_state(state, frames)
    print("warm done", flush=True)

    for rep in range(3):
        t0 = time.perf_counter()
        state, total = pipe.run_frames_state(state, frames)  # int() = sync
        dt = time.perf_counter() - t0
        total = int(total)
        nres = getattr(pipe, "last_resorts", None)
        res_str = (
            f"resorts={nres} ({nres/max(total,1):.2f}/substep)"
            if nres is not None
            else "resorts=n/a"
        )
        print(
            f"rep{rep}: {dt*1e3:.1f} ms, {total} substeps -> "
            f"{dt/max(total,1)*1e3:.2f} ms/substep, {res_str}, "
            f"pups={n*total/dt/1e6:.1f}M",
            flush=True,
        )
    # The stage profilers below take an UNPACKED population at the fallen
    # state (they re-pack internally).
    p = pipe.unpack_state(state)

    print("profiling substep stages at the fallen state...", flush=True)
    t = profile_fused_substep(pipe, p)
    print(t, flush=True)
    print("profiling resort at the fallen state...", flush=True)
    r = profile_resort(pipe, p)
    print(r, flush=True)


if __name__ == "__main__":
    main()
