"""Halo/interior overlap evidence (VERDICT r3 missing #2).

The reference engineers halo/interior overlap by hand with a second CUDA
stream (cuda_mpm_pipeline.rs:180-181,407-498: halo g2p2g on halo_stream,
interior g2p2g on the main stream, merge after sync). sparkl_tpu's claim has
been "XLA's latency-hiding scheduler overlaps the halo collectives with
interior compute" — this script turns that claim into a checkable artifact.

How: AOT-compile the REAL multi-chip program (DomainFusedPipeline frames
span) against a virtual v5e:2x4 TPU topology (`jax.experimental.topologies`
— compile-only, no 8-chip hardware needed; this is the actual Mosaic+XLA TPU
pipeline, not the CPU backend, which lowers collectives synchronously and
can show nothing). Then parse the scheduled HLO: TPU executables are fully
scheduled, so instruction order in each computation IS the schedule. For
every `collective-permute-start` → `collective-permute-done` window, count
the compute ops (fusions / dots / Mosaic custom-calls) the scheduler placed
INSIDE the window — those run while the ICI transfer is in flight.

Output: a summary table (stdout) + docs/OVERLAP.md. A nightly test asserts
the halo permutes overlap real work (tests/test_domain_fused.py).
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# Result types may be tuples containing spaces (async-start ops), so match
# "<name> = <anything> <opcode>(" rather than a single \S+ type token.
COMPUTE_RE = re.compile(
    r"=\s+[^=]*?\s(fusion|dot|custom-call|convolution)\("
)
START_RE = re.compile(
    r"(%[\w\.\-]+)\s*=\s*.*?\scollective-permute-start\("
)
DONE_RE = re.compile(r"collective-permute-done\((%[\w\.\-]+)")


def permute_windows(hlo_text):
    """Per scheduled computation: list of (ops_inside, window_len) for each
    collective-permute start→done window.

    Computation headers are detected as lines ending in `{` that declare a
    `-> result_type` (a simple `\\(...\\)` arg regex breaks on tuple-typed
    params — the while-loop body where the halo permutes actually live has
    them, which is exactly the computation a naive parser drops). Multiple
    permutes may be in flight at once, so windows are matched start→done by
    the start's result name."""
    results = []  # (computation_name, [(n_compute_inside, n_lines)])
    comp_name = None
    lines_in = []
    for line in hlo_text.splitlines():
        stripped = line.rstrip()
        # `/*index=N*/` comments inside long param lists contain `=`; strip
        # comments before testing "no assignment left of ->".
        nocomment = re.sub(r"/\*.*?\*/", "", line)
        is_header = stripped.endswith("{") and (
            line.startswith("ENTRY")
            or ("->" in nocomment and "=" not in nocomment.split("->")[0])
        )
        if is_header:
            comp_name = line.split("(")[0].strip().lstrip("%")
            lines_in = []
            continue
        if line.strip() == "}":
            if lines_in and any(START_RE.search(l) for l in lines_in):
                wins = []
                open_at = {}  # start result name -> (line idx, computes seen)
                n_compute_total = 0
                for i, l in enumerate(lines_in):
                    ms = START_RE.search(l)
                    md = DONE_RE.search(l)
                    if ms:
                        open_at[ms.group(1)] = (i, n_compute_total)
                    elif md:
                        st = open_at.pop(md.group(1), None)
                        if st is not None:
                            wins.append(
                                (n_compute_total - st[1], i - st[0] - 1)
                            )
                    elif COMPUTE_RE.search(l):
                        n_compute_total += 1
                results.append((comp_name, wins))
            comp_name, lines_in = None, []
            continue
        if comp_name is not None:
            lines_in.append(line)
    return results


def build_compiled_text(scale=20, topology="v5e:2x4"):
    import jax
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import sparkl_tpu as sk
    from sparkl_tpu.core.grid import GridParams
    from sparkl_tpu.models import registry
    from sparkl_tpu.parallel.domain import DomainFusedPipeline

    topo = topologies.get_topology_desc(topology, platform="tpu")
    n = len(topo.devices)
    mesh = Mesh(np.array(topo.devices).reshape(n), ("x",))

    grid = GridParams(origin=(0.0, 0.0, 0.0), cell_width=0.1,
                      res=(128, 32, 32))
    models = registry.ModelSet.pack([
        registry.ParticleModel(
            registry.corotated_linear_elasticity(1.0e5, 0.2),
            registry.drucker_prager_plasticity(1.0e5, 0.2),
        )
    ])
    colliders = [sk.cuboid((100.0, 0.5, 100.0), translation=(0.0, 0.25, 0.0),
                           friction=0.3)]
    params = sk.SolverParameters(dt=1.0 / 60.0)
    dom = DomainFusedPipeline(
        grid, models, colliders, params, [0.0, -9.81, 0.0], mesh=mesh,
        max_halo_blocks=64, max_migrants=512,
    )
    # Concrete particles only for capacity calibration (host-side numpy).
    p = sk.cube_particles(origin=(1.0, 1.5, 1.2), counts=(scale, 6, 6),
                          model_id=0, particle_radius=0.025, density0=2700.0)
    dom._ensure_cfg(p)
    # distribute()'s layout: per-shard rows sized for the worst shard plus
    # the migration buffer (compile-only, so build the abstract pytree with
    # the same capacity math instead of device_put).
    from sparkl_tpu.core.particles import Particles

    cap_shard = int(p.capacity / n * 1.5) + dom.max_migrants
    tmpl = Particles.empty(n * cap_shard, grid.dim)
    f = dom._build_frames_jit(1, cap_shard)
    sharding = NamedSharding(mesh, P("x"))
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding),
        tmpl,
    )
    return f.lower(abstract).compile().as_text()


def main():
    # Cache the AOT-compiled HLO so parser iteration doesn't pay the
    # multi-minute TPU compile each run (SPARKL_OVERLAP_HLO=path to reuse;
    # --recompile forces a fresh build).
    cache = os.environ.get("SPARKL_OVERLAP_HLO", "/tmp/overlap_hlo.txt")
    if os.path.exists(cache) and "--recompile" not in sys.argv:
        with open(cache) as fh:
            txt = fh.read()
        print(f"reusing cached HLO {cache} ({len(txt)} bytes)")
    else:
        txt = build_compiled_text()
        with open(cache, "w") as fh:
            fh.write(txt)
        print(f"wrote HLO cache {cache} ({len(txt)} bytes)")
    # Count op DEFINITIONS (name references in done/operand lists would
    # over-count ~3x).
    n_starts = txt.count("collective-permute-start(")
    if n_starts == 0:
        print("WARNING: compiled program contains NO collective-permute-start"
              " ops — either collectives were lowered synchronously or the"
              " program has no permutes; OVERLAP.md would be vacuous.")
    res = permute_windows(txt)
    total_wins = sum(len(w) for _, w in res)
    # Parser sanity: every start in the text must be accounted a window.
    if total_wins < n_starts:
        print(f"WARNING: {n_starts} permute-starts in HLO but only "
              f"{total_wins} parsed windows — parser missed computations.")
    overlapped = sum(1 for _, w in res for c, _ in w if c > 0)
    print(f"computations with permutes: {len(res)}; "
          f"windows: {total_wins}; with compute inside: {overlapped}")
    lines = [
        "# Halo/interior overlap evidence",
        "",
        "Generated by `scripts/overlap_evidence.py`: the DomainFusedPipeline",
        "1-frame span AOT-compiled for a virtual **v5e:2x4** topology (the",
        "real XLA-TPU backend + latency-hiding scheduler; CPU lowers",
        "collectives synchronously and proves nothing). TPU HLO is fully",
        "scheduled, so ops between `collective-permute-start` and its",
        "`-done` execute while the ICI transfer is in flight — the XLA",
        "equivalent of the reference's dual-stream halo choreography",
        "(cuda_mpm_pipeline.rs:180-181,407-498).",
        "",
        "| computation | permute windows | windows with compute inside | "
        "compute ops inside (per window) |",
        "|---|---|---|---|",
    ]
    for name, wins in res:
        if not wins:
            continue
        inside = [c for c, _ in wins]
        lines.append(
            f"| `{name[:60]}` | {len(wins)} | "
            f"{sum(1 for c in inside if c > 0)} | {inside} |"
        )
    lines += [
        "",
        f"**Total: {total_wins} windows, {overlapped} with interior compute "
        "scheduled inside.**",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "OVERLAP.md")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
