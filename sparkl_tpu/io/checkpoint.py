"""Checkpoint / resume: full scene state serialization.

Ref: the reference serializes the entire scene via serde
(`src/dynamics/particle.rs:6` Serialize on Particle/ParticleSet,
`src/dynamics/particle_model.rs:21-89` custom serde via the Core model
enums, solver params too). Here the particle pytree + model tables +
solver/grid config round-trip through a single .npz (host) file; an Orbax
adapter is provided for async multi-host checkpointing when available.
"""

import dataclasses
import json
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from sparkl_tpu.core.grid import GridParams
from sparkl_tpu.core.params import (
    BoundaryHandling,
    DamageModel,
    SimulationDofs,
    SolverParameters,
)
from sparkl_tpu.core.particles import Particles
from sparkl_tpu.models.registry import ModelSet

_FORMAT_VERSION = 1


def save(path, particles: Particles, models: ModelSet = None,
         grid: GridParams = None, params: SolverParameters = None, extra=None):
    """Write scene state to a single .npz."""
    arrays = {}
    for f in dataclasses.fields(Particles):
        arrays[f"particles/{f.name}"] = np.asarray(getattr(particles, f.name))
    meta = {"version": _FORMAT_VERSION}
    if models is not None:
        for name in ("ctype", "cparams", "ptype", "pparams", "ftype", "fparams"):
            arrays[f"models/{name}"] = np.asarray(getattr(models, name))
        meta["models"] = {
            "present_c": list(models.present_c),
            "present_p": list(models.present_p),
            "present_f": list(models.present_f),
        }
    if grid is not None:
        meta["grid"] = {
            "origin": list(grid.origin),
            "cell_width": grid.cell_width,
            "res": list(grid.res),
        }
    if params is not None:
        meta["params"] = {
            "dt": params.dt,
            "max_substep_dt": params.max_substep_dt
            if np.isfinite(params.max_substep_dt)
            else "inf",
            "max_num_substeps": params.max_num_substeps,
            "boundary_handling": int(params.boundary_handling),
            "damage_model": int(params.damage_model),
            "force_fluids_volume_recomputation": params.force_fluids_volume_recomputation,
            "enable_boundary_particle_projection": params.enable_boundary_particle_projection,
            "stop_after_one_substep": params.stop_after_one_substep,
            "simulation_dofs": int(params.simulation_dofs),
        }
    if extra:
        meta["extra"] = extra
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load(path):
    """Returns (particles, models|None, grid|None, params|None, extra|None)."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["__meta__"].tobytes()).decode())
    assert meta["version"] == _FORMAT_VERSION

    pkw = {}
    for f in dataclasses.fields(Particles):
        pkw[f.name] = jnp.asarray(data[f"particles/{f.name}"])
    particles = Particles(**pkw)

    models = None
    if "models" in meta:
        models = ModelSet(
            ctype=jnp.asarray(data["models/ctype"]),
            cparams=jnp.asarray(data["models/cparams"]),
            ptype=jnp.asarray(data["models/ptype"]),
            pparams=jnp.asarray(data["models/pparams"]),
            ftype=jnp.asarray(data["models/ftype"]),
            fparams=jnp.asarray(data["models/fparams"]),
            present_c=tuple(meta["models"]["present_c"]),
            present_p=tuple(meta["models"]["present_p"]),
            present_f=tuple(meta["models"]["present_f"]),
        )

    grid = None
    if "grid" in meta:
        g = meta["grid"]
        grid = GridParams(
            origin=tuple(g["origin"]), cell_width=g["cell_width"], res=tuple(g["res"])
        )

    params = None
    if "params" in meta:
        q = meta["params"]
        params = SolverParameters(
            dt=q["dt"],
            max_substep_dt=float("inf")
            if q["max_substep_dt"] == "inf"
            else q["max_substep_dt"],
            max_num_substeps=q["max_num_substeps"],
            boundary_handling=BoundaryHandling(q["boundary_handling"]),
            damage_model=DamageModel(q["damage_model"]),
            force_fluids_volume_recomputation=q["force_fluids_volume_recomputation"],
            enable_boundary_particle_projection=q["enable_boundary_particle_projection"],
            stop_after_one_substep=q["stop_after_one_substep"],
            simulation_dofs=SimulationDofs(q["simulation_dofs"]),
        )

    return particles, models, grid, params, meta.get("extra")


def save_orbax(path, particles: Particles):
    """Orbax adapter (async, multi-host capable) for the particle pytree."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, particles)
    ckptr.wait_until_finished()


def load_orbax(path, template: Particles) -> Particles:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)
