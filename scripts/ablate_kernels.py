"""Ablation profiler for the fused Pallas kernels.

Times kernel A (p2g_fused) and kernel B (g2p_fused) on the current backend
with individual physics stages stubbed out (by monkeypatching the module
functions the kernel bodies close over), to attribute in-kernel time to
weights / transfer dots / stress / plasticity / dt-bound. Use on the real
TPU; per-variant numbers carry the same dispatch-null subtraction as
utils.timings.

Usage: python scripts/ablate_kernels.py [scene] [--bf16]
"""

import sys
import time
from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import sparkl_tpu as sk
import sparkl_tpu.scenes as scenes
from sparkl_tpu.fused import kernels as K
from sparkl_tpu.fused.pipeline import FusedMpmPipeline
from sparkl_tpu.models import plasticity as plas
from sparkl_tpu.math import cmat
from sparkl_tpu.utils.timings import _null_ms, _sync


@contextmanager
def patched(obj, name, repl):
    orig = getattr(obj, name)
    setattr(obj, name, repl)
    try:
        yield
    finally:
        setattr(obj, name, orig)


def timeit(f, *a, iters=20, null=0.0):
    # jax.jit's C++ fast path caches by function IDENTITY: re-jitting the
    # same `run_a` object under a different monkeypatch returns the OLD
    # executable and silently ignores the stubs (this bit once — every
    # variant measured identical). Clear caches and wrap in a fresh lambda
    # so each variant genuinely retraces under its patches.
    jax.clear_caches()
    jf = jax.jit(lambda *args: f(*args))
    r = jf(*a)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jf(*a)
    _sync(r)
    return max((time.perf_counter() - t0) / iters * 1000.0 - null, 0.0)


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "sand3"
    bf16 = "--bf16" in sys.argv

    b = scenes.build(scene)
    pipe = sk.auto_pipeline(b, prefer="fused")
    assert isinstance(pipe, FusedMpmPipeline), type(pipe)
    if bf16:
        pipe._meta["tdtype"] = jnp.bfloat16
    pipe._ensure_cfg(b.particles)
    grid, cfg, meta = pipe.grid, pipe._cfg, pipe._meta
    state = pipe._pack(b.particles)
    dtj = jnp.asarray(1e-3, jnp.float32)
    null = _null_ms(20)
    print(f"scene={scene} chunks={cfg.max_chunks} C={cfg.chunk_size} "
          f"null={null:.3f} ms bf16={bf16}")

    def run_a():
        return K.p2g_fused(grid, cfg, meta, state.slots, state.ints, dtj,
                           pipe._tab_f, pipe._tab_i)

    def run_b():
        # windows: zeros are fine for timing (same op graph).
        dim = grid.dim
        rs = 8
        n_win = dim + (1 if meta["with_psi"] else 0)
        win = jnp.zeros(
            (cfg.max_chunks, n_win * rs ** (dim - 1), rs), jnp.float32
        )
        return K.g2p_fused(grid, cfg, meta, pipe._kparams, state.slots,
                           state.ints, win.reshape(cfg.max_chunks, -1, rs),
                           dtj, pipe._tab_f, pipe._tab_i)

    # --- stubs ------------------------------------------------------------
    def no_stress(meta_, tf, ti, mid, phase, eh, f, g, mass, vol0):
        return cmat.zeros_like_mat(f)

    def const_weights(grid_, data, iref, dim, rows, i):
        c = data.shape[2]
        w = [jnp.full((8, c), 0.1, jnp.float32) for _ in range(dim)]
        wd = [jnp.full((8, c), 0.05, jnp.float32) for _ in range(dim)]
        return w, wd

    def no_dp(pp, phase, f, pdd, ph, lvg):
        return f, pdd, ph, lvg

    def no_nacc(pp, f, a):
        return f, a

    def no_bound(meta_, tf, ti, mid, phase, eh, f, mass, vol0, vn, vs, h, d):
        return jnp.full(phase.shape, jnp.inf, jnp.float32)

    def no_energy(meta_, tf, ti, mid, phase, eh, f, s=None):
        return jnp.zeros_like(phase)

    rows = []

    rows.append(("A full", timeit(run_a, null=null)))
    with patched(K, "_kirchhoff_stress_c", no_stress):
        rows.append(("A -stress", timeit(run_a, null=null)))
    with patched(K, "_axis_weights_chunk", const_weights):
        rows.append(("A -weights", timeit(run_a, null=null)))
    with patched(K, "_kirchhoff_stress_c", no_stress), \
         patched(K, "_axis_weights_chunk", const_weights):
        rows.append(("A -stress -weights", timeit(run_a, null=null)))

    def no_dp_svd(pp, phase, f, pdd, ph, lvg, usv):
        return f, pdd, ph, lvg, usv[1]

    def fake_svd(f):
        # Structure-preserving stub: removes the Jacobi/eigen work but keeps
        # every downstream consumer (DP projection, energy, stress epilogue).
        d = len(f)
        one = jnp.ones_like(f[0][0])
        zero = jnp.zeros_like(one)
        eye = [[one if i == j else zero for j in range(d)] for i in range(d)]
        return eye, [one] * d, [r[:] for r in eye]

    rows.append(("B full", timeit(run_b, null=null)))
    import importlib
    svd_mod = importlib.import_module("sparkl_tpu.math.svd")
    prev = svd_mod.set_eig3_method("cardano")
    try:
        rows.append(("B cardano-svd", timeit(run_b, null=null)))
    finally:
        svd_mod.set_eig3_method(prev)
    with patched(K, "svd_c", fake_svd), \
         patched(plas, "drucker_prager_update_with_svd_c", no_dp_svd):
        rows.append(("B -svd -dp", timeit(run_b, null=null)))
    with patched(K, "svd_c", fake_svd):
        rows.append(("B -svd", timeit(run_b, null=null)))
    with patched(plas, "drucker_prager_update_c", no_dp), \
         patched(plas, "drucker_prager_update_with_svd_c", no_dp_svd), \
         patched(plas, "nacc_update_c", no_nacc):
        rows.append(("B -plasticity", timeit(run_b, null=null)))
    with patched(K, "_axis_weights_chunk", const_weights):
        rows.append(("B -weights", timeit(run_b, null=null)))
    with patched(K, "_timestep_bound_c", no_bound), \
         patched(K, "_pos_energy_c", no_energy):
        rows.append(("B -dtbound -energy", timeit(run_b, null=null)))
    with patched(plas, "drucker_prager_update_c", no_dp), \
         patched(plas, "nacc_update_c", no_nacc), \
         patched(K, "_timestep_bound_c", no_bound), \
         patched(K, "_pos_energy_c", no_energy), \
         patched(K, "_axis_weights_chunk", const_weights):
        rows.append(("B transfers-only", timeit(run_b, null=null)))

    for name, ms in rows:
        print(f"  {name:<22s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
