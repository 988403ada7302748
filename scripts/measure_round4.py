"""Round-4 TPU measurement sweep — the stages round 3 never finished
(VERDICT r3 item 2), updated for the state-resident pipeline API.

Stages:
  3. kernel ablation rows (B full / cardano-svd / -svd / -energy / ...)
  2. resort per-stage profile (relabel fast path vs build/src/permute)
  9. merge DMA vs XLA gather
  5. per-scene fused-vs-sparse substep table (state-resident fused spans)
  8. combined-lever bench (cardano / bf16 on top of the shipped defaults)
  c. cardano eig3 accuracy + substep profile vs jacobi default

Appends to scripts/measure_round4.log; each stage runs in a FRESH
subprocess (a JAX client that initialized during a tunnel outage can wedge).

Usage: python scripts/measure_round4.py [--stages 3,2,9,5,8,c]
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "measure_round4.log")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def run_stage(name, code, timeout_s=1800, env=None, wait_s=1800.0):
    """Returns 'ok', 'fail' (ran but errored/timed out), or 'tunnel'."""
    import bench

    if not bench._wait_for_device(wait_s):
        log(f"{name}: SKIPPED (tunnel down for the whole wait budget)")
        return "tunnel"
    log(f"{name}: starting")
    e = dict(os.environ)
    if env:
        e.update(env)
    t0 = time.monotonic()
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, timeout=timeout_s, env=e,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
    except subprocess.TimeoutExpired:
        log(f"{name}: TIMED OUT after {timeout_s}s")
        return "fail"
    dtw = time.monotonic() - t0
    out = r.stdout.decode(errors="replace").strip()
    err = r.stderr.decode(errors="replace").strip()
    if r.returncode != 0:
        log(f"{name}: FAILED rc={r.returncode} ({dtw:.0f}s)\n--- stderr tail:\n"
            + "\n".join(err.splitlines()[-15:]))
        return "fail"
    log(f"{name}: ok ({dtw:.0f}s)\n" + out)
    return "ok"


STAGE2 = """
import sys; sys.path.insert(0, '.')
import sparkl_tpu.scenes as scenes
from sparkl_tpu.fused.pipeline import FusedMpmPipeline
from sparkl_tpu.utils.timings import profile_resort
b = scenes.build('sand3', nx=100, ny=50, nz=50)
pipe = FusedMpmPipeline(b.grid, b.models, b.colliders, b.params, b.gravity, b.hooks)
t = profile_resort(pipe, b.particles)
print(t)
"""

# Per-scene comparison on CONTINUING state: fused spans are state-resident
# (pack once outside the timed region), sparse spans go through its own
# jitted whole-frame program; both warm one frame first.
STAGE5 = """
import sys, time; sys.path.insert(0, '.')
import numpy as np, jax
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

STAGE9 = """
import sys, time; sys.path.insert(0, '.')
import jax, jax.numpy as jnp
import sparkl_tpu.scenes as scenes
from sparkl_tpu.fused.pipeline import FusedMpmPipeline
from sparkl_tpu.sparse import transfer as T
from sparkl_tpu.fused import kernels as K
from sparkl_tpu.utils.timings import _null_ms, _sync
b = scenes.build('sand3', nx=100, ny=50, nz=50)
pipe = FusedMpmPipeline(b.grid, b.models, b.colliders, b.params, b.gravity, b.hooks)
pipe._ensure_cfg(b.particles)
state = pipe._jit_pack(b.particles)
images = K.p2g_fused(pipe.grid, pipe._cfg, pipe._meta, state.slots,
                     state.ints, jnp.float32(1e-3), pipe._tab_f, pipe._tab_i)
null = _null_ms(20)
for dma in (False, True):
    f = jax.jit(lambda im: T.merge_images_to_grid(
        pipe.grid, pipe._cfg, state.structure, im,
        cell_order=T.ZMAJOR_ORDER_3D, gather=True, dma=dma))
    r = f(images); _sync(r)
    t0 = time.perf_counter()
    for _ in range(20):
        r = f(images)
    _sync(r)
    ms = (time.perf_counter() - t0) / 20 * 1000.0 - null
    print(f"merge dma={dma}: {ms:.2f} ms", flush=True)
"""

# Cardano eig3 backend: accuracy vs jacobi on the live slot state's F rows
# + full substep profile under each backend.
STAGEC = """
import sys; sys.path.insert(0, '.')
import os
import sparkl_tpu.scenes as scenes
from sparkl_tpu.fused.pipeline import FusedMpmPipeline
from sparkl_tpu.utils.timings import profile_fused_substep
b = scenes.build('sand3', nx=100, ny=50, nz=50)
pipe = FusedMpmPipeline(b.grid, b.models, b.colliders, b.params, b.gravity, b.hooks)
t = profile_fused_substep(pipe, b.particles)
print('eig3 =', os.environ.get('SPARKL_EIG3', 'jacobi(default)'))
print(t)
"""


def main():
    stages = os.environ.get("STAGES", "3,2,9,5,8,c")
    if "--stages" in sys.argv:
        stages = sys.argv[sys.argv.index("--stages") + 1]
    budget_h = float(os.environ.get("SWEEP_BUDGET_H", "6"))
    want = [s for s in stages.split(",") if s]
    log(f"=== round-4 measurement sweep start (stages {want}, budget {budget_h}h) ===")

    def attempt(key):
        if key == "2":
            return run_stage("stage2 resort profile", STAGE2)
        if key == "3":
            return run_stage(
                "stage3 kernel ablation",
                "import sys, runpy; sys.argv=['ablate_kernels.py']; "
                "runpy.run_path('scripts/ablate_kernels.py', run_name='__main__')",
                timeout_s=2400,
            )
        if key == "5":
            return run_stage("stage5 per-scene fused vs sparse", STAGE5,
                             timeout_s=3600)
        if key == "8":
            combos = [
                ("cardano", {"SPARKL_EIG3": "cardano"}),
                ("bf16", {"SPARKL_BENCH_DTYPE": "bfloat16"}),
                ("cardano+bf16", {"SPARKL_EIG3": "cardano",
                                  "SPARKL_BENCH_DTYPE": "bfloat16"}),
            ]
            res = []
            for name, env in combos:
                env = dict(env, SPARKL_BENCH_TUNNEL_WAIT="60")
                r = run_stage(f"stage8 bench combo {name}",
                              "import runpy; runpy.run_path('bench.py', run_name='__main__')", env=env)
                if r == "tunnel":
                    return r
                res.append(r)
            return "ok" if all(x == "ok" for x in res) else "fail"
        if key == "9":
            return run_stage("stage9 merge dma-vs-xla", STAGE9, timeout_s=900)
        if key == "c":
            a = run_stage("stageC substep profile eig3=jacobi", STAGEC)
            if a == "tunnel":
                return a
            b = run_stage("stageC substep profile eig3=cardano", STAGEC,
                          env={"SPARKL_EIG3": "cardano"})
            return b if b == "tunnel" else ("ok" if (a, b) == ("ok", "ok") else "fail")
        log(f"unknown stage {key}")
        return "fail"

    deadline = time.monotonic() + budget_h * 3600.0
    fails = {}
    pending = list(want)
    while pending and time.monotonic() < deadline:
        nxt = []
        for key in pending:
            r = attempt(key)
            if r == "ok":
                continue
            if r == "fail":
                fails[key] = fails.get(key, 0) + 1
                if fails[key] >= 3:
                    log(f"stage{key}: giving up after 3 failed runs")
                    continue
            nxt.append(key)
        pending = nxt
        if pending:
            log(f"stages {pending} pending; retrying (budget "
                f"{(deadline - time.monotonic()) / 3600.0:.1f}h left)")
            time.sleep(60.0)
    log(f"=== sweep done (unfinished: {pending}) ===")


if __name__ == "__main__":
    main()
