import numpy as np
import jax.numpy as jnp
import pytest

from sparkl_tpu.math.kernel import (
    quadratic_weights_1d,
    quadratic_eval,
    quadratic_eval_derivative,
    inv_d,
)
from sparkl_tpu.math.svd import svd2x2, svd3x3
from sparkl_tpu.math import linalg, morton


def test_kernel_partition_of_unity():
    # Weights over the 3-node stencil sum to 1 for fx in [0.5, 1.5).
    fx = jnp.linspace(0.5, 1.4999, 101)
    w = quadratic_weights_1d(fx)
    np.testing.assert_allclose(np.sum(np.asarray(w), axis=-1), 1.0, atol=1e-6)
    assert np.all(np.asarray(w) >= 0.0)


def test_kernel_matches_full_spline():
    # quadratic_weights_1d(fx)[k] == N(fx - k) for stencil offsets k=0,1,2.
    fx = np.linspace(0.5, 1.4999, 57).astype(np.float32)
    w = np.asarray(quadratic_weights_1d(jnp.asarray(fx)))
    for k in range(3):
        np.testing.assert_allclose(
            w[:, k], np.asarray(quadratic_eval(jnp.asarray(fx - k))), atol=1e-6
        )


def test_kernel_derivative_fd():
    x = np.linspace(-2.0, 2.0, 301).astype(np.float64)
    eps = 1e-3  # f32 arithmetic downstream; keep FD step above noise
    fd = (
        np.asarray(quadratic_eval(jnp.asarray(x + eps)))
        - np.asarray(quadratic_eval(jnp.asarray(x - eps)))
    ) / (2 * eps)
    an = np.asarray(quadratic_eval_derivative(jnp.asarray(x)))
    # Exclude non-smooth points +-0.5, +-1.5.
    mask = np.min(np.abs(x[:, None] - np.array([[-1.5, -0.5, 0.5, 1.5]])), axis=1) > 2e-3
    np.testing.assert_allclose(an[mask], fd[mask], atol=5e-3)


def test_inv_d():
    assert np.isclose(inv_d(0.1), 4.0 / 0.01)


def _check_svd(f, u, s, v, atol):
    f = np.asarray(f, np.float64)
    u = np.asarray(u, np.float64)
    s = np.asarray(s, np.float64)
    v = np.asarray(v, np.float64)
    d = f.shape[-1]
    # Reconstruction
    rec = u @ (s[..., None] * np.swapaxes(v, -1, -2))
    np.testing.assert_allclose(rec, f, atol=atol)
    # Orthogonality
    eye = np.broadcast_to(np.eye(d), f.shape)
    np.testing.assert_allclose(u @ np.swapaxes(u, -1, -2), eye, atol=atol)
    np.testing.assert_allclose(v @ np.swapaxes(v, -1, -2), eye, atol=atol)
    # Non-negative singular values
    assert np.all(s >= -1e-6)
    # Match numpy's singular values (sorted)
    s_np = np.linalg.svd(f, compute_uv=False)
    np.testing.assert_allclose(
        np.sort(s, axis=-1)[..., ::-1], s_np, atol=atol
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_svd2x2_random(seed):
    rng = np.random.default_rng(seed)
    f = rng.normal(size=(256, 2, 2)).astype(np.float32)
    u, s, v = svd2x2(jnp.asarray(f))
    _check_svd(f, u, s, v, 2e-5)


def test_svd2x2_special():
    cases = np.stack(
        [
            np.eye(2),
            np.zeros((2, 2)),
            np.diag([1.0, -1.0]),  # reflection
            np.diag([3.0, 0.0]),  # rank 1
            np.array([[0.0, 1.0], [1.0, 0.0]]),
            np.diag([1e-4, 1e4]),
            np.array([[1.0, 0.5], [0.5, 1.0]]),
        ]
    ).astype(np.float32)
    u, s, v = svd2x2(jnp.asarray(cases))
    _check_svd(cases, u, s, v, 1e-3)


@pytest.mark.parametrize("seed", [0, 1])
def test_svd3x3_random(seed):
    rng = np.random.default_rng(seed)
    f = rng.normal(size=(256, 3, 3)).astype(np.float32)
    u, s, v = svd3x3(jnp.asarray(f))
    # 1e-3 on O(1) random matrices: f32 accumulation through 24 rotations.
    _check_svd(f, u, s, v, 1e-3)


def test_svd3x3_near_deformation_gradients():
    # F near identity — the actual regime for MPM elastic states.
    rng = np.random.default_rng(3)
    f = (np.eye(3) + 0.1 * rng.normal(size=(512, 3, 3))).astype(np.float32)
    u, s, v = svd3x3(jnp.asarray(f))
    _check_svd(f, u, s, v, 2e-4)


def test_svd3x3_special():
    cases = np.stack(
        [
            np.eye(3),
            np.zeros((3, 3)),
            np.diag([1.0, 1.0, -1.0]),  # inverted
            np.diag([2.0, 1.0, 0.0]),  # rank 2
            np.diag([5.0, 0.0, 0.0]),  # rank 1
            np.diag([1e-3, 1.0, 1e3]),  # poor conditioning
        ]
    ).astype(np.float32)
    u, s, v = svd3x3(jnp.asarray(cases))
    _check_svd(cases, u, s, v, 5e-3)


def test_svd3x3_inverted_det_sign():
    rng = np.random.default_rng(7)
    f = rng.normal(size=(64, 3, 3)).astype(np.float32)
    detf = np.linalg.det(f)
    u, s, v = svd3x3(jnp.asarray(f))
    sign = np.linalg.det(np.asarray(u)) * np.linalg.det(np.asarray(v))
    np.testing.assert_allclose(sign, np.sign(detf), atol=1e-3)


def test_linalg_det_inverse():
    rng = np.random.default_rng(0)
    for d in (2, 3):
        m = rng.normal(size=(32, d, d)).astype(np.float32) + 2 * np.eye(d, dtype=np.float32)
        np.testing.assert_allclose(
            np.asarray(linalg.det(jnp.asarray(m))), np.linalg.det(m), rtol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(linalg.inverse(jnp.asarray(m))), np.linalg.inv(m), rtol=1e-3, atol=1e-3
        )


def test_sym_eigvals():
    rng = np.random.default_rng(1)
    for d, fn in ((2, linalg.sym_eigvals_2x2), (3, linalg.sym_eigvals_3x3)):
        a = rng.normal(size=(64, d, d)).astype(np.float32)
        sym = 0.5 * (a + np.swapaxes(a, -1, -2))
        got = np.sort(np.asarray(fn(jnp.asarray(sym))), axis=-1)
        want = np.sort(np.linalg.eigvalsh(sym), axis=-1)
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_morton_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, 1 << 16, size=128), jnp.uint32)
    y = jnp.asarray(rng.integers(0, 1 << 16, size=128), jnp.uint32)
    code = morton.morton2_encode(x, y)
    x2, y2 = morton.morton2_decode(code)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))

    x = jnp.asarray(rng.integers(0, 1 << 10, size=128), jnp.uint32)
    y = jnp.asarray(rng.integers(0, 1 << 10, size=128), jnp.uint32)
    z = jnp.asarray(rng.integers(0, 1 << 10, size=128), jnp.uint32)
    code = morton.morton3_encode(x, y, z)
    x2, y2, z2 = morton.morton3_decode(code)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z2))


def test_inv_exact():
    x = jnp.asarray([0.0, 2.0, -4.0])
    np.testing.assert_allclose(np.asarray(linalg.inv_exact(x)), [0.0, 0.5, -0.25])


def test_native_host_runtime():
    """C++ host library (native/sparkl_host.cpp) agrees with the numpy paths."""
    from sparkl_tpu import native

    lib = native.get_lib()
    if lib is None:
        import pytest

        pytest.skip("native toolchain unavailable")

    rng = np.random.default_rng(0)
    # cube sampler == numpy lattice
    pts = native.cube_particles((1.0, 2.0, 3.0), (4, 5, 6), 0.05)
    axes = [np.arange(c, dtype=np.float32) for c in (4, 5, 6)]
    mesh = np.meshgrid(*axes, indexing="ij")
    want = np.stack([m.reshape(-1) for m in mesh], -1) * 0.1 + np.array(
        [1.0, 2.0, 3.0], np.float32
    )
    np.testing.assert_allclose(pts, want, atol=1e-6)

    # polygon containment == numpy even-odd
    poly = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    q = rng.uniform(-0.5, 1.5, size=(500, 2)).astype(np.float32)
    got = native.polygon_contains(poly, q)
    want = (
        (q[:, 0] > 0) & (q[:, 0] < 1) & (q[:, 1] > 0) & (q[:, 1] < 1)
    )
    # Exclude points within eps of edges (tie-breaking differs harmlessly).
    interior = np.min(
        np.abs(np.stack([q[:, 0], 1 - q[:, 0], q[:, 1], 1 - q[:, 1]])), axis=0
    ) > 1e-4
    np.testing.assert_array_equal(got[interior], want[interior])

    # morton codes == jnp implementation
    pos = rng.uniform(0, 50, size=(1000, 3)).astype(np.float32)
    codes = native.morton_codes(pos, (0.0, 0.0, 0.0), 0.1)
    cells = np.floor(pos / 0.1).astype(np.uint32)
    want = np.asarray(
        morton.morton3_encode(
            jnp.asarray(cells[:, 0] & 0x3FF),
            jnp.asarray(cells[:, 1] & 0x3FF),
            jnp.asarray(cells[:, 2] & 0x3FF),
        ),
        np.uint64,
    )
    # Native uses 21-bit fields; restrict comparison to coords < 1024 where
    # the two agree bit-for-bit.
    small = (cells < 1024).all(axis=1)
    np.testing.assert_array_equal(codes[small] & np.uint64((1 << 30) - 1),
                                  want[small])

    # calibration == numpy unique-count path
    from sparkl_tpu.core.grid import GridParams
    from sparkl_tpu.sparse import blocks as B

    grid = GridParams(origin=(0.0, 0.0, 0.0), cell_width=0.1, res=(64, 64, 64))
    act = np.ones(len(pos), bool)
    got = native.calibrate_blocks(pos, act, grid.origin, 0.1, grid.res, 4, 128)
    assert got is not None
    n_blocks, n_chunks, n_grid = got
    # numpy oracle
    base = np.round(pos / 0.1).astype(np.int64) - 1
    ok = ((base >= 0) & (base + 2 <= 63)).all(axis=1)
    bc = base[ok] // 4
    bspace = (16, 16, 16)
    key = (bc[:, 0] * 16 + bc[:, 1]) * 16 + bc[:, 2]
    uniq, cnt = np.unique(key, return_counts=True)
    assert n_blocks == len(uniq)
    assert n_chunks == int(np.sum(-(-cnt // 128)))


@pytest.mark.parametrize("family", ["random", "near_identity", "special", "inverted"])
def test_svd3x3_cardano_backend(family):
    """The closed-form Cardano eigensolver backend (set_eig3_method) must
    satisfy the same SVD contract as the Jacobi default — it exists because
    the in-kernel SVD is the dominant per-particle VPU cost."""
    import importlib

    _svd_mod = importlib.import_module("sparkl_tpu.math.svd")

    rng = np.random.default_rng(11)
    if family == "random":
        f = rng.normal(size=(256, 3, 3)).astype(np.float32)
        atol = 1e-3
    elif family == "near_identity":
        f = (np.eye(3) + 0.1 * rng.normal(size=(512, 3, 3))).astype(np.float32)
        atol = 2e-4
    elif family == "special":
        f = np.stack(
            [
                np.eye(3), np.zeros((3, 3)), np.diag([1.0, 1.0, -1.0]),
                np.diag([2.0, 1.0, 0.0]), np.diag([5.0, 0.0, 0.0]),
                np.diag([1e-3, 1.0, 1e3]),
            ]
        ).astype(np.float32)
        atol = 5e-3
    else:
        f = rng.normal(size=(64, 3, 3)).astype(np.float32)
        atol = 1e-3

    prev = _svd_mod.set_eig3_method("cardano")
    try:
        u, s, v = svd3x3(jnp.asarray(f))
    finally:
        _svd_mod.set_eig3_method(prev)
    _check_svd(f, u, s, v, atol)
    if family == "inverted":
        detf = np.linalg.det(f)
        sign = np.linalg.det(np.asarray(u)) * np.linalg.det(np.asarray(v))
        np.testing.assert_allclose(sign, np.sign(detf), atol=1e-3)
