from sparkl_tpu.geometry.colliders import (
    Collider,
    ColliderSet,
    cuboid,
    halfspace,
    ball,
    capsule,
    heightfield,
    polyline,
    trimesh,
)
