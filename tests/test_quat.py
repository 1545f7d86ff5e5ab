import jax
import jax.numpy as jnp
import numpy as np

from lara_tpu.utils.quat import quat_to_rotmat, rotmat_to_quat


def test_identity():
    R = quat_to_rotmat(jnp.array([1.0, 0.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)


def test_orthonormal_and_roundtrip():
    q = jax.random.normal(jax.random.PRNGKey(1), (64, 4))
    R = quat_to_rotmat(q)
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(3), (64, 3, 3)), atol=1e-5)
    dets = np.linalg.det(np.asarray(R))
    np.testing.assert_allclose(dets, 1.0, atol=1e-5)

    q2 = rotmat_to_quat(R)
    R2 = quat_to_rotmat(q2)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


def test_known_rotation():
    # 90° about z: (w,x,y,z) = (cos45, 0, 0, sin45) maps x->y.
    s = np.sqrt(0.5)
    R = np.asarray(quat_to_rotmat(jnp.array([s, 0.0, 0.0, s])))
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0.0, 1.0, 0.0], atol=1e-6)
