"""Regenerate the golden-trajectory fixtures (tests/golden_scenes.json).

Run deliberately when physics semantics intentionally change:

    JAX_PLATFORMS=cpu python tests/make_goldens.py

Records per-frame summary statistics of the DENSE reference pipeline
(sparkl_tpu.solver.pipeline.MpmPipeline — the transcription of the reference
CPU `MlsSolver`, mls_solver.rs:15-139) on a reduced configuration of every
reference example scene. tests/test_regression.py replays them on the dense
AND fused pipelines.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import sparkl_tpu.scenes as scenes  # noqa: E402
from sparkl_tpu.solver.pipeline import MpmPipeline  # noqa: E402

# Reduced-scale configs: small enough for CPU replay in CI, big enough to
# exercise every model/collider/damage path of the full scene.
GOLDEN_CONFIGS = {
    "elasticity2": dict(),
    "fluids2": dict(n=40),
    "basic2": dict(),
    "l_panel2": dict(cell_width=0.02, dt=1.0 / 600.0),
    "sand3": dict(nx=12, ny=6, nz=6),
    "cube_through_sand3": dict(nx=12, ny=6, nz=6),
    "sand_penetration3": dict(nx=12, ny=6, nz=6),
    "fluids3": dict(),
}
NUM_FRAMES = 10


def stats(p):
    act = np.asarray(p.active)
    pos = np.asarray(p.position)[act]
    vel = np.asarray(p.velocity)[act]
    ke = float(0.5 * np.sum(np.asarray(p.mass)[act][:, None] * vel**2))
    return dict(
        com=[float(x) for x in pos.mean(axis=0)],
        pos_min=[float(x) for x in pos.min(axis=0)],
        pos_max=[float(x) for x in pos.max(axis=0)],
        ke=ke,
        failed=int(np.asarray(p.failed)[act].sum()),
        broken=int((np.asarray(p.phase)[act] == 0.0).sum()),
    )


def main():
    out = {}
    for name, kw in GOLDEN_CONFIGS.items():
        print(f"=== {name} {kw}", flush=True)
        b = scenes.build(name, **kw)
        pipe = MpmPipeline(b.grid, b.models, b.colliders, b.params, b.gravity, b.hooks)
        p = b.particles
        frames = []
        for frame in range(NUM_FRAMES):
            p, niter = pipe.step_with_stats(p)
            rec = stats(p)
            rec["frame"] = frame
            rec["substeps"] = int(niter)
            frames.append(rec)
            print(f"  frame {frame}: substeps={rec['substeps']} ke={rec['ke']:.4g} "
                  f"failed={rec['failed']} broken={rec['broken']}", flush=True)
        out[name] = dict(config=kw, frames=frames)

    path = os.path.join(os.path.dirname(__file__), "golden_scenes.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
