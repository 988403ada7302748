"""Scene runner CLI — the reference's examples binaries, headless.

Ref: `cargo run --bin examples2d -- --example <Name>` (examples2d/main.rs:19-29)
selected a scene into the bevy testbed. Here:

    python -m sparkl_tpu.run --scene sand3 --frames 60 --out /tmp/sand3

runs the scene with the block-sparse TPU pipeline (or --pipeline dense) and
optionally writes per-frame particle snapshots (positions/velocities/phase,
the same fields the testbed reads back — testbed_plugin.rs:533-588) plus a
final full checkpoint.
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="sparkl_tpu scene runner")
    ap.add_argument("--scene", required=True, help="scene name (see --list)")
    ap.add_argument("--list", action="store_true", help="list scenes and exit")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--pipeline", choices=["auto", "fused", "sparse", "dense"], default="auto")
    ap.add_argument("--out", default=None, help="output dir for snapshots")
    ap.add_argument("--save-every", type=int, default=10)
    ap.add_argument("--profile", action="store_true", help="per-stage timings")
    ap.add_argument(
        "--render", default=None, metavar="MODE",
        help="also write PNGs of saved frames (static/velocity/density_ratio/"
             "position/phase/blocks)",
    )
    ap.add_argument("--platform", default=None, help="force jax platform (cpu)")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    os.makedirs("/tmp/jaxcache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    import sparkl_tpu.scenes as scenes

    if args.list:
        print("\n".join(scenes.scene_names()))
        return 0

    b = scenes.build(args.scene)
    n = int(np.asarray(b.particles.num_active))
    print(f"scene={b.name} particles={n} grid_res={b.grid.res} h={b.grid.cell_width}")

    import sparkl_tpu as sk

    pipe = sk.auto_pipeline(b, prefer=args.pipeline)
    print(f"pipeline={type(pipe).__name__}")

    if args.profile:
        from sparkl_tpu.fused.pipeline import FusedMpmPipeline
        from sparkl_tpu.sparse.pipeline import SparseMpmPipeline
        from sparkl_tpu.utils.timings import (
            profile_fused_substep,
            profile_sparse_substep,
        )

        if isinstance(pipe, FusedMpmPipeline):
            t = profile_fused_substep(pipe, b.particles)
        elif isinstance(pipe, SparseMpmPipeline):
            t = profile_sparse_substep(pipe, b.particles)
        else:
            t = None
            print(f"--profile: no per-stage profiler for {type(pipe).__name__}")
        if t is not None:
            print("substep stage timings:")
            print(t.pretty())

    if args.out:
        os.makedirs(args.out, exist_ok=True)

    p = b.particles
    sim_time = 0.0
    wall0 = time.perf_counter()
    total_substeps = 0
    for frame in range(args.frames):
        t0 = time.perf_counter()
        p, niter = pipe.step_with_stats(p)
        nit = int(niter)
        total_substeps += nit
        sim_time += b.params.dt
        dt_wall = time.perf_counter() - t0
        act = np.asarray(p.active)
        pos = np.asarray(p.position)[act]
        print(
            f"frame {frame:4d}  substeps {nit:3d}  wall {dt_wall*1000:8.1f} ms  "
            f"y[{pos[:, 1].min():8.3f}, {pos[:, 1].max():8.3f}]  "
            f"failed {int(np.asarray(p.failed)[act].sum())}"
        )
        if args.out and (frame % args.save_every == 0 or frame == args.frames - 1):
            np.savez_compressed(
                os.path.join(args.out, f"frame_{frame:05d}.npz"),
                position=np.asarray(p.position),
                velocity=np.asarray(p.velocity),
                phase=np.asarray(p.phase),
                active=np.asarray(p.active),
                failed=np.asarray(p.failed),
                # Grid metadata so the viewer can serve the "blocks" debug
                # coloring (ref: testbed_plugin.rs:38-58 ParticleMode::Blocks).
                cell_width=np.float32(b.grid.cell_width),
                grid_origin=np.asarray(b.grid.origin, np.float32),
            )
            if args.render:
                from sparkl_tpu import viz

                viz.render(
                    p, os.path.join(args.out, f"frame_{frame:05d}.png"),
                    mode=args.render, grid=b.grid,
                    title=f"{b.name} frame {frame}",
                )

    wall = time.perf_counter() - wall0
    print(
        f"done: {args.frames} frames, {total_substeps} substeps, "
        f"{wall:.1f}s wall, {n * total_substeps / wall / 1e6:.2f} M particle-updates/s"
    )
    if args.out:
        from sparkl_tpu.io import checkpoint

        checkpoint.save(
            os.path.join(args.out, "final.npz"), p, b.models, b.grid, b.params,
            extra={"scene": b.name, "frames": args.frames},
        )
        print(f"checkpoint: {os.path.join(args.out, 'final.npz')}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
