"""Morton (Z-order) codes, 2D and 3D, vectorized uint32 jnp.

Ref: sparkl `src_core/utils/morton2.rs` / `morton3.rs` (magic-number bit
interleave). Used for spatially-coherent ordering of sparse grid blocks so
that neighboring blocks land near each other in the block table.
"""

import jax.numpy as jnp


def _part1by1(x):
    x = x.astype(jnp.uint32) & jnp.uint32(0x0000FFFF)
    x = (x | (x << 8)) & jnp.uint32(0x00FF00FF)
    x = (x | (x << 4)) & jnp.uint32(0x0F0F0F0F)
    x = (x | (x << 2)) & jnp.uint32(0x33333333)
    x = (x | (x << 1)) & jnp.uint32(0x55555555)
    return x


def _compact1by1(x):
    x = x.astype(jnp.uint32) & jnp.uint32(0x55555555)
    x = (x | (x >> 1)) & jnp.uint32(0x33333333)
    x = (x | (x >> 2)) & jnp.uint32(0x0F0F0F0F)
    x = (x | (x >> 4)) & jnp.uint32(0x00FF00FF)
    x = (x | (x >> 8)) & jnp.uint32(0x0000FFFF)
    return x


def _part1by2(x):
    x = x.astype(jnp.uint32) & jnp.uint32(0x000003FF)
    x = (x | (x << 16)) & jnp.uint32(0xFF0000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def _compact1by2(x):
    x = x.astype(jnp.uint32) & jnp.uint32(0x09249249)
    x = (x | (x >> 2)) & jnp.uint32(0x030C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0300F00F)
    x = (x | (x >> 8)) & jnp.uint32(0xFF0000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x000003FF)
    return x


def morton2_encode(x, y):
    """Interleave two 16-bit coords into a 32-bit Z-order key."""
    return _part1by1(x) | (_part1by1(y) << 1)


def morton2_decode(code):
    code = code.astype(jnp.uint32)
    return _compact1by1(code), _compact1by1(code >> 1)


def morton3_encode(x, y, z):
    """Interleave three 10-bit coords into a 30-bit Z-order key."""
    return _part1by2(x) | (_part1by2(y) << 1) | (_part1by2(z) << 2)


def morton3_decode(code):
    code = code.astype(jnp.uint32)
    return _compact1by2(code), _compact1by2(code >> 1), _compact1by2(code >> 2)
