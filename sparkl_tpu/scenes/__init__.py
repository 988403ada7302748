"""Example scenes mirroring the reference's examples2d/ & examples3d/
(the reference's de-facto integration suite — SURVEY.md §4).

Each builder returns a SceneBundle; `build(name)` is the scene registry
(the reference selects scenes with `--example <Name>`, examples2d/main.rs:19-29).
"""

from dataclasses import dataclass, field
from typing import Callable, Dict, Sequence, Tuple

from sparkl_tpu.core.grid import GridParams
from sparkl_tpu.core.params import SolverParameters
from sparkl_tpu.core.particles import Particles
from sparkl_tpu.models.registry import ModelSet


@dataclass
class SceneBundle:
    name: str
    grid: GridParams
    models: ModelSet
    colliders: tuple
    particles: Particles
    params: SolverParameters
    gravity: tuple
    hooks: object = None
    # Runtime collider animation: `collider_pose_fn(t) -> tuple` aligned
    # with `colliders`, entries None (static) or (translation, rotation)
    # traced arrays (ref: the testbed animates rapier colliders per frame,
    # testbed_plugin.rs:452-456). None = all-static scene.
    collider_pose_fn: object = None


_REGISTRY: Dict[str, Callable[..., SceneBundle]] = {}


def register_scene(name):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def scene_names():
    return sorted(_REGISTRY)


def build(name, **kw) -> SceneBundle:
    from sparkl_tpu.scenes import (  # noqa: F401  (registration side effects)
        scenes2d,
        scenes3d,
    )

    return _REGISTRY[name](**kw)


# Trigger registration at import.
from sparkl_tpu.scenes import scenes2d, scenes3d  # noqa: E402,F401
