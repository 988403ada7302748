"""Measure the slot-row access cost of the two candidate kernel layouts.

[D, NF, C] (chunk-major, current): row k of a program's nr chunks is
data[:, k, :] — sublane k%8 of nr different (8,128) tiles, i.e. a sublane
shuffle per row access. [NF, D, C] (field-major): row k is one full
[nr, C] vreg, no shuffle. The physics section of the fused kernels makes
~100 row reads + ~56 row writes per program, so if the shuffle is real it
dominates the kernels' fixed cost. Run on TPU: python scripts/layout_probe.py
"""
import sys, time, functools
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

D, NF, C, NR = 6656, 56, 128, 8
NROWS = 48  # row reads per variant (physics-section scale)
ITERS = 50

def bench(name, kernel, shape, spec):
    x = jnp.ones(shape, jnp.float32)
    def run(x):
        return pl.pallas_call(
            kernel, grid=(D // NR,),
            in_specs=[spec],
            out_specs=pl.BlockSpec((NR, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((D, C), jnp.float32),
        )(x)
    def loop(x):
        def body(c, _):
            # The kernel input must DEPEND on the carry: with a loop-invariant
            # input XLA hoists the pallas_call out of the scan (LICM) and the
            # probe times an empty loop (the round-4 first runs printed
            # 0.000-0.001 ms rows). 1e-30*sum keeps c ~0 without DCE.
            return 1e-30 * jnp.sum(run(x + c)), ()
        return jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)[0]
    jf = jax.jit(loop)
    float(jf(x))  # warm (value read = real sync through the tunnel)
    # MEDIAN of value-read reps: through the axon tunnel block_until_ready
    # can return without the work being done (observed ~60us "reps" on a
    # 70ms program); reading the scalar result is the only reliable sync.
    reps = []
    for _ in range(5):
        t0 = time.perf_counter(); float(jf(x))
        reps.append(time.perf_counter() - t0)
    reps.sort()
    print(f"{name:24s} {reps[2]/ITERS*1000:7.3f} ms", flush=True)

def k_chunk_major(x_ref, o_ref):
    data = x_ref[...]  # [NR, NF, C]
    acc = jnp.zeros((NR, C), jnp.float32)
    for k in range(NROWS):
        acc = acc + data[:, k, :] * (1.0 + 0.001 * k)
    o_ref[...] = acc

def k_field_major(x_ref, o_ref):
    data = x_ref[...]  # [NF, NR, C]
    acc = jnp.zeros((NR, C), jnp.float32)
    for k in range(NROWS):
        acc = acc + data[k] * (1.0 + 0.001 * k)
    o_ref[...] = acc

bench("chunk-major [D,NF,C]", k_chunk_major, (D, NF, C),
      pl.BlockSpec((NR, NF, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM))
bench("field-major [NF,D,C]", k_field_major, (NF, D, C),
      pl.BlockSpec((NF, NR, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM))

# write-side: stack 48 rows back out
def kw_chunk_major(x_ref, o_ref):
    data = x_ref[...]
    rows = [data[:, k, :] * 1.001 for k in range(NROWS)]
    o_ref[...] = jnp.stack(rows, axis=1)

def kw_field_major(x_ref, o_ref):
    data = x_ref[...]
    rows = [data[k] * 1.001 for k in range(NROWS)]
    o_ref[...] = jnp.stack(rows, axis=0)

def bench_w(name, kernel, shape, ispec, oshape, ospec):
    x = jnp.ones(shape, jnp.float32)
    def run(x):
        return pl.pallas_call(
            kernel, grid=(D // NR,), in_specs=[ispec], out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
        )(x)
    def loop(x):
        def body(c, _):
            # The kernel input must DEPEND on the carry: with a loop-invariant
            # input XLA hoists the pallas_call out of the scan (LICM) and the
            # probe times an empty loop (the round-4 first runs printed
            # 0.000-0.001 ms rows). 1e-30*sum keeps c ~0 without DCE.
            return 1e-30 * jnp.sum(run(x + c)), ()
        return jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)[0]
    jf = jax.jit(loop)
    float(jf(x))  # warm (value read = real sync through the tunnel)
    # MEDIAN of value-read reps: through the axon tunnel block_until_ready
    # can return without the work being done (observed ~60us "reps" on a
    # 70ms program); reading the scalar result is the only reliable sync.
    reps = []
    for _ in range(5):
        t0 = time.perf_counter(); float(jf(x))
        reps.append(time.perf_counter() - t0)
    reps.sort()
    print(f"{name:24s} {reps[2]/ITERS*1000:7.3f} ms", flush=True)

bench_w("r+w chunk-major", kw_chunk_major, (D, NF, C),
        pl.BlockSpec((NR, NF, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        (D, NROWS, C),
        pl.BlockSpec((NR, NROWS, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM))
bench_w("r+w field-major", kw_field_major, (NF, D, C),
        pl.BlockSpec((NF, NR, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        (NROWS, D, C),
        pl.BlockSpec((NROWS, NR, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM))
