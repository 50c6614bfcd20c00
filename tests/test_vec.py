import jax
import jax.numpy as jnp
import numpy as np

from rpt_tpu.vec import Affine, Mat3, Vec3, from_local, orthonormal_basis, reflect


def test_vec_ops():
    a = Vec3.of(1.0, 2.0, 3.0)
    b = Vec3.of(4.0, 5.0, 6.0)
    assert np.isclose(a.dot(b), 32.0)
    assert np.allclose(a.cross(b).to_numpy(), np.cross([1, 2, 3], [4, 5, 6]))
    assert np.isclose(a.normalize().length(), 1.0, atol=1e-6)
    assert np.allclose((a * b).to_numpy(), [4, 10, 18])


def test_vec_is_pytree():
    v = Vec3.of(jnp.ones(4), jnp.zeros(4), jnp.ones(4))
    out = jax.jit(lambda v: v * 2.0)(v)
    assert np.allclose(out.x, 2.0)


def test_orthonormal_basis():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(100, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    n = Vec3.from_array(d)
    t, b = orthonormal_basis(n)
    assert np.allclose(t.dot(n), 0.0, atol=1e-5)
    assert np.allclose(b.dot(n), 0.0, atol=1e-5)
    assert np.allclose(t.dot(b), 0.0, atol=1e-5)
    assert np.allclose(t.length(), 1.0, atol=1e-5)
    # from_local maps +Y to n
    y = Vec3.of(np.zeros(100), np.ones(100), np.zeros(100))
    mapped = from_local(y, n)
    assert np.allclose(mapped.to_numpy(), d, atol=1e-5)


def test_reflect():
    v = Vec3.of(1.0, -1.0, 0.0)
    n = Vec3.of(0.0, 1.0, 0.0)
    r = reflect(v, n)
    assert np.allclose(r.to_numpy(), [1.0, 1.0, 0.0])


def test_affine():
    m = np.eye(4)
    m[:3, :3] = np.diag([2.0, 3.0, 4.0])
    m[:3, 3] = [1.0, 0.0, -1.0]
    a = Affine.from_numpy(m)
    p = a.apply_point(Vec3.of(1.0, 1.0, 1.0))
    assert np.allclose(p.to_numpy(), [3.0, 3.0, 3.0])
    d = a.apply_dir(Vec3.of(1.0, 1.0, 1.0))
    assert np.allclose(d.to_numpy(), [2.0, 3.0, 4.0])
