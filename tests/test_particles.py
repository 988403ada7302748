"""Particle-set runtime management (ref: src/cuda/cuda_particle_set.rs)."""

import numpy as np

import sparkl_tpu as sk


def test_remove_range_truncate_compact():
    """Runtime add/remove parity (ref: cuda_particle_set.rs truncate /
    remove_range): removal deactivates slots; compact drops them."""
    p = sk.cube_particles(
        origin=(0.0, 0.0), counts=(4, 4), model_id=0,
        particle_radius=0.05, density0=1000.0,
    )
    assert int(np.asarray(p.num_active)) == 16
    q = p.remove_range(4, 8)
    assert int(np.asarray(q.num_active)) == 12
    assert not np.asarray(q.active)[4:8].any()
    assert np.asarray(q.mass)[4:8].sum() == 0.0
    t = q.truncate(10)
    assert int(np.asarray(t.num_active)) == 6
    c = t.compact()
    assert c.capacity == 6
    assert np.asarray(c.active).all()
    # Positions of survivors are preserved in order.
    keep = np.asarray(t.active)
    np.testing.assert_array_equal(
        np.asarray(c.position), np.asarray(t.position)[keep]
    )
