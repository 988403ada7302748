"""Fine-grained kernel-B ablation: bisect INSIDE the SVD + DP chain.

Round-4's ablation (`ablate_kernels.py`) showed the SVD is ~half of kernel
B's in-kernel time (B full 4.67 / B cardano 2.97 / B -svd 1.43 @850k).
This script attributes the SVD's internal stages (eigenvalues, invariant
refinement, V-column construction, U construction) and DP's transcendental
block, to pick the next cut. Same monkeypatch + fresh-lambda methodology as
ablate_kernels (jit caches by identity — see the comment there).

Usage: python scripts/ablate_svd.py [scene] [--big]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_HERE = __import__("os").path.dirname(__import__("os").path.abspath(__file__))
sys.path.insert(0, _HERE)                    # for ablate_kernels import
sys.path.insert(0, __import__("os").path.dirname(_HERE))  # repo root

import sparkl_tpu as sk
import sparkl_tpu.scenes as scenes
from sparkl_tpu.fused import kernels as K
from sparkl_tpu.fused.pipeline import FusedMpmPipeline
from sparkl_tpu.models import plasticity as plas
import importlib
svd_mod = importlib.import_module("sparkl_tpu.math.svd")
from sparkl_tpu.math import cmat
from sparkl_tpu.utils.timings import _null_ms

from ablate_kernels import patched, timeit  # noqa: E402


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "sand3"
    kw = dict(nx=100, ny=50, nz=100) if "--big" in sys.argv else {}

    b = scenes.build(scene, **kw)
    pipe = sk.auto_pipeline(b, prefer="fused")
    assert isinstance(pipe, FusedMpmPipeline), type(pipe)
    pipe._ensure_cfg(b.particles)
    grid, cfg, meta = pipe.grid, pipe._cfg, pipe._meta
    state = pipe._pack(b.particles)
    dtj = jnp.asarray(1e-3, jnp.float32)
    null = _null_ms(20)
    print(f"scene={scene}{kw or ''} chunks={cfg.max_chunks} C={cfg.chunk_size} "
          f"null={null:.3f} ms eig3={svd_mod._EIG3_METHOD}")

    def run_b():
        dim = grid.dim
        rs = 8
        n_win = dim + (1 if meta["with_psi"] else 0)
        win = jnp.zeros(
            (cfg.max_chunks, n_win * rs ** (dim - 1), rs), jnp.float32
        )
        return K.g2p_fused(grid, cfg, meta, pipe._kparams, state.slots,
                           state.ints, win.reshape(cfg.max_chunks, -1, rs),
                           dtj, pipe._tab_f, pipe._tab_i)

    # --- SVD-internal stubs -------------------------------------------------
    real_eig = svd_mod._sym_eig3x3_cardano
    real_from_eig = svd_mod._svd3x3_from_eig

    def eig_vals_only(a00, a01, a02, a11, a12, a22):
        # Keep the (refined) eigenvalue math, replace the V-column
        # construction (2x row_cross_null + orthonormalization) with identity.
        lam, _ = real_eig(a00, a01, a02, a11, a12, a22)
        one = jnp.ones_like(a00)
        zero = jnp.zeros_like(a00)
        return lam, [(one, zero, zero), (zero, one, zero), (zero, zero, one)]

    def eig_no_refine(a00, a01, a02, a11, a12, a22):
        # Raw trig values (no invariant refinement), real V columns.
        l0, l1, l2 = svd_mod._cardano_trig_vals(a00, a01, a02, a11, a12, a22)
        _, cols = real_eig(a00, a01, a02, a11, a12, a22)
        return [l0, l1, l2], cols

    def eig_raw_only(a00, a01, a02, a11, a12, a22):
        # Raw trig values AND identity V: isolates _cardano_trig_vals itself.
        l0, l1, l2 = svd_mod._cardano_trig_vals(a00, a01, a02, a11, a12, a22)
        one = jnp.ones_like(a00)
        zero = jnp.zeros_like(a00)
        return [l0, l1, l2], [(one, zero, zero), (zero, one, zero), (zero, zero, one)]

    def from_eig_no_u(f, sig2, cols):
        # Skip the U construction (3 matvecs + Gram-Schmidt + fallbacks):
        # U := V. Keeps shapes/consumers intact.
        s = [jnp.sqrt(jnp.maximum(x, 0.0)) for x in sig2]
        v = [[cols[k][i] for k in range(3)] for i in range(3)]
        return v, s, [r[:] for r in v]

    # --- DP transcendental stub --------------------------------------------
    real_dp = plas.drucker_prager_update_with_svd_c

    def dp_cheap_translog(params, phase, f, pdd, ph, lvg, usv):
        # Same op graph as the real DP but log->x-1 and exp->1+x: isolates
        # the transcendental cost from the selection/recompose structure.
        import sparkl_tpu.models.plasticity as P

        with patched(jnp, "log", lambda x: x - 1.0), \
             patched(jnp, "exp", lambda x: 1.0 + x):
            return real_dp(params, phase, f, pdd, ph, lvg, usv)

    def no_stress_epi(meta_, tf, ti, mid, phase, eh, f, usv):
        d = len(f)
        z = jnp.zeros_like(phase)
        return [[z for _ in range(d)] for _ in range(d)]

    def no_energy(meta_, tf, ti, mid, phase, eh, f, s=None):
        return jnp.zeros_like(phase)

    def no_bound(meta_, tf, ti, mid, phase, eh, f, mass, vol0, vn, vs, h, d):
        return jnp.full(phase.shape, jnp.inf, jnp.float32)

    rows = []
    rows.append(("B full", timeit(run_b, null=null)))
    with patched(svd_mod, "_sym_eig3x3_cardano", eig_vals_only):
        rows.append(("B svd: identity-V", timeit(run_b, null=null)))
    with patched(svd_mod, "_sym_eig3x3_cardano", eig_no_refine):
        rows.append(("B svd: no-refine", timeit(run_b, null=null)))
    with patched(svd_mod, "_sym_eig3x3_cardano", eig_raw_only):
        rows.append(("B svd: raw-vals+idV", timeit(run_b, null=null)))
    with patched(svd_mod, "_svd3x3_from_eig", from_eig_no_u):
        rows.append(("B svd: U:=V", timeit(run_b, null=null)))
    with patched(svd_mod, "_sym_eig3x3_cardano", eig_vals_only), \
         patched(svd_mod, "_svd3x3_from_eig", from_eig_no_u):
        rows.append(("B svd: vals-only", timeit(run_b, null=null)))
    with patched(plas, "drucker_prager_update_with_svd_c", dp_cheap_translog):
        rows.append(("B dp: cheap-translog", timeit(run_b, null=null)))
    with patched(K, "_cached_stress_epilogue_c", no_stress_epi):
        rows.append(("B -stress-epilogue", timeit(run_b, null=null)))
    with patched(K, "_pos_energy_c", no_energy):
        rows.append(("B -energy", timeit(run_b, null=null)))
    with patched(K, "_timestep_bound_c", no_bound):
        rows.append(("B -dtbound", timeit(run_b, null=null)))

    for name, ms in rows:
        print(f"  {name:<24s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
