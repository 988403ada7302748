"""Round-5 measurement sweep (run on the tunneled TPU v5e chip).

Stages (each a fresh subprocess; output appended to measure_round5.log):
  5: per-scene fused-vs-sparse substep table — the POST-Mosaic-fix numbers
     whose round-4 log only recorded pre-fix errors (VERDICT r4 item 4).
  r: composed-substep prefix bisect at sand3@1M (diag_residual2) — commits
     the in-program marginal attribution (VERDICT r4 item 2).
  c: per-stage profile tables at sand3@1M fallen + 500k settled
     (utils.timings.profile_fused_substep) — includes the grid_update
     number for the round-4 gating-regression diagnosis (item 6).
  d: 2D small-N attribution: elasticity2 composed substep wall +
     device-trace top ops (item 5).
  8: bench record (default nr + the round-5 nr sweep values).

Usage: python scripts/measure_round5.py [--stages 5,r,c,d,8]
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(ROOT, "scripts", "measure_round5.log")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def run_stage(name, code, env=None, timeout_s=3600):
    log(f"--- {name} start ---")
    e = dict(os.environ)
    if env:
        e.update(env)
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], cwd=ROOT, env=e,
            capture_output=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        log(f"--- {name} TIMEOUT ({timeout_s}s) ---")
        return "fail"
    out = r.stdout.decode(errors="replace")
    err = r.stderr.decode(errors="replace")
    for line in out.splitlines():
        log(f"  {line}")
    if r.returncode != 0:
        tail = "\n".join(err.splitlines()[-12:])
        log(f"--- {name} FAILED rc={r.returncode} ---\n{tail}")
        return "fail"
    log(f"--- {name} ok ---")
    return "ok"


STAGE5 = """
import sys, time; sys.path.insert(0, '.')
import numpy as np, jax, os
os.makedirs('/tmp/jaxcache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
import sparkl_tpu.scenes as scenes
from sparkl_tpu.fused.pipeline import FusedMpmPipeline
from sparkl_tpu.sparse.pipeline import SparseMpmPipeline
for name in ['elasticity2', 'fluids2', 'basic2', 'l_panel2', 'sand3']:
    b = scenes.build(name)
    row = [name]
    for cls in (FusedMpmPipeline, SparseMpmPipeline):
        try:
            pipe = cls(b.grid, b.models, b.colliders, b.params, b.gravity, b.hooks)
            if hasattr(pipe, 'pack_state'):
                st = pipe.pack_state(b.particles)
                st, _ = pipe.run_frames_state(st, 1)   # compile+warm
                reps = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    st, tot = pipe.run_frames_state(st, 1)
                    tot = int(tot)
                    reps.append((time.perf_counter() - t0) / max(tot, 1) * 1e3)
            else:
                p, _ = pipe.run_frames(b.particles, 1)   # compile+warm
                reps = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    p, tot = pipe.run_frames(p, 1)
                    tot = int(tot)
                    reps.append((time.perf_counter() - t0) / max(tot, 1) * 1e3)
            row.append(f"{cls.__name__[:5]} {min(reps):.2f} ms/substep ({tot} sub)")
        except Exception as ex:
            row.append(f"{cls.__name__[:5]} ERR {type(ex).__name__}: {ex}")
    print('  '.join(row), flush=True)
"""

STAGEC = """
import sys; sys.path.insert(0, '.')
import os, jax
os.makedirs('/tmp/jaxcache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
import sparkl_tpu.scenes as scenes
from sparkl_tpu.fused.pipeline import FusedMpmPipeline
from sparkl_tpu.utils.timings import profile_fused_substep

for label, kw, frames in (
    ('sand3@1M fallen', dict(nx=100, ny=50, nz=100), 5),
    ('sand3@500k settled', dict(nx=100, ny=50, nz=50), 30),
):
    b = scenes.build('sand3', **kw)
    pipe = FusedMpmPipeline(b.grid, b.models, b.colliders, b.params,
                            b.gravity, b.hooks)
    p, _ = pipe.run_frames(b.particles, frames)
    t = profile_fused_substep(pipe, p)
    print(label, flush=True)
    print(t.pretty(), flush=True)
"""

STAGED = """
import sys, time; sys.path.insert(0, '.')
import os, jax, jax.numpy as jnp
os.makedirs('/tmp/jaxcache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
import sparkl_tpu.scenes as scenes
from sparkl_tpu.fused.pipeline import FusedMpmPipeline

b = scenes.build('elasticity2')
pipe = FusedMpmPipeline(b.grid, b.models, b.colliders, b.params, b.gravity,
                        b.hooks)
state = pipe.pack_state(b.particles)
state, _ = pipe.run_frames_state(state, 1)
dt = jnp.asarray(float(b.params.dt) / 47.0, jnp.float32)
n_sub = 50

def run(s):
    def step(s, _):
        return pipe._substep(s, dt)[0], ()
    return jax.lax.scan(step, s, None, length=n_sub)[0]

jf = jax.jit(run)
r = jf(state); float(jnp.sum(r.slots.ravel()[:1]))
reps = []
for _ in range(5):
    t0 = time.perf_counter()
    r = jf(state); float(jnp.sum(r.slots.ravel()[:1]))
    reps.append(time.perf_counter() - t0)
reps.sort()
print(f'elasticity2 composed bare substep: {reps[2]/n_sub*1e3:.3f} ms/substep'
      f' (cfg chunks={pipe._cfg.max_chunks}, grid_blocks={pipe._cfg.max_grid_blocks})',
      flush=True)

# Device-trace attribution of the 2D substep.
import glob
from collections import defaultdict
jax.profiler.start_trace('/tmp/jaxtrace2d')
r = jf(state); float(jnp.sum(r.slots.ravel()[:1]))
jax.profiler.stop_trace()
paths = sorted(glob.glob('/tmp/jaxtrace2d/**/*.xplane.pb', recursive=True))
data = jax.profiler.ProfileData.from_file(paths[-1])
for plane in data.planes:
    if 'TPU' not in plane.name:
        continue
    agg = defaultdict(float); total = 0.0
    for line in plane.lines:
        for ev in line.events:
            agg[ev.name] += ev.duration_ns / 1e6
            total += ev.duration_ns / 1e6
    for nme, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:18]:
        print(f'  {nme[:78]:78s} {ms/n_sub:7.4f} ms/sub', flush=True)
"""


def main():
    stages = "5,r,c,d,8"
    if "--stages" in sys.argv:
        stages = sys.argv[sys.argv.index("--stages") + 1]
    for key in [s for s in stages.split(",") if s]:
        if key == "5":
            run_stage("stage5 per-scene fused vs sparse", STAGE5, timeout_s=5400)
        elif key == "r":
            run_stage(
                "stageR composed-substep prefix bisect @1M",
                "import sys, runpy; sys.argv=['diag_residual2.py', '20']; "
                "runpy.run_path('scripts/diag_residual2.py', run_name='__main__')",
                timeout_s=5400,
            )
        elif key == "c":
            run_stage("stageC fused stage tables (1M fallen / 500k settled)",
                      STAGEC, timeout_s=5400)
        elif key == "d":
            run_stage("stageD 2D small-N attribution (elasticity2)", STAGED,
                      timeout_s=3600)
        elif key == "8":
            for name, env in (
                ("default", {}),
                ("nr32", {"SPARKL_CHUNKS_PER_PROGRAM": "32"}),
            ):
                run_stage(
                    f"stage8 bench {name}",
                    "import runpy; runpy.run_path('bench.py', run_name='__main__')",
                    env=dict(env, SPARKL_BENCH_TUNNEL_WAIT="600",
                             SPARKL_BENCH_REPS="5"),
                    timeout_s=3600,
                )
        else:
            log(f"unknown stage {key}")


if __name__ == "__main__":
    main()
