"""Device-side profiler attribution of the composed fused substep.

VERDICT r4 item 2: the per-stage profile sums to ~7.3 ms at sand3@1M fallen
but the composed scanned `_substep` measures ~12.4 ms — attribute the
residual with a REAL device trace instead of host-side wall clocks. Captures
one jax.profiler trace of a jitted scan of the bare substep and aggregates
TPU-plane op durations by fusion/op name (the reference's per-stage
CUDA-event methodology, cuda_mpm_pipeline.rs:30-85, taken down to op level).

Usage: python scripts/diag_trace.py [n_substeps] [--out DIR]
"""

import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/tmp/jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import jax.numpy as jnp
import numpy as np

import sparkl_tpu.scenes as scenes
from sparkl_tpu.fused.pipeline import FusedMpmPipeline


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32).ravel()[:1]))


def main():
    n_sub = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    out_dir = "/tmp/jaxtrace"
    if "--out" in sys.argv:
        out_dir = sys.argv[sys.argv.index("--out") + 1]

    b = scenes.build("sand3", nx=100, ny=50, nz=100)
    pipe = FusedMpmPipeline(
        b.grid, b.models, b.colliders, b.params, b.gravity, b.hooks
    )
    state = pipe.pack_state(b.particles)
    state, _ = pipe.run_frames_state(state, 5)  # falling phase
    sync(state.slots)
    dt = jnp.asarray(float(b.params.dt) / 40.0, jnp.float32)

    def run(s):
        def step(s, _):
            return pipe._substep(s, dt)[0], ()

        return jax.lax.scan(step, s, None, length=n_sub)[0]

    jf = jax.jit(run)
    r = jf(state)
    sync(r.slots)  # compile + warm
    t0 = time.perf_counter()
    r = jf(state)
    sync(r.slots)
    wall = time.perf_counter() - t0
    print(f"scanned bare _substep: {wall/n_sub*1e3:.2f} ms/substep "
          f"({n_sub} substeps, wall {wall*1e3:.0f} ms)")

    jax.profiler.start_trace(out_dir)
    r = jf(state)
    sync(r.slots)
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                             recursive=True))
    assert paths, f"no xplane.pb under {out_dir}"
    data = jax.profiler.ProfileData.from_file(paths[-1])

    for plane in data.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        print(f"\n== plane: {plane.name} ==")
        agg = defaultdict(float)
        cnt = defaultdict(int)
        total = 0.0
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                agg[ev.name] += dur
                cnt[ev.name] += 1
                total += dur
        rows = sorted(agg.items(), key=lambda kv: -kv[1])
        print(f"{'op/fusion':70s} {'total ms':>9s} {'/substep':>9s} "
              f"{'count':>6s} {'%':>5s}")
        shown = 0.0
        for name, ms in rows[:40]:
            print(f"{name[:70]:70s} {ms:9.2f} {ms/n_sub:9.3f} "
                  f"{cnt[name]:6d} {100*ms/max(total,1e-9):5.1f}")
            shown += ms
        print(f"[top-40 covers {100*shown/max(total,1e-9):.1f}% of "
              f"{total:.1f} ms plane total; {total/n_sub:.2f} ms/substep]")


if __name__ == "__main__":
    main()
