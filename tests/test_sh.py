"""SH basis: orthonormality + reference-convention spot checks.

Golden signs/values follow the cheind/torch-spherical-harmonics convention
used by the reference (tools/rsh.py): Ynm at index n*(n+1)+m, degree-1 row
[c0, -c1*y, c1*z, -c1*x].
"""

import jax
import jax.numpy as jnp
import numpy as np

from lara_tpu.utils.sh import eval_sh_color, rsh_cart

C0 = 0.28209479177387814
C1 = 0.4886025119029199


def test_degree1_spot_values():
    xyz = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = np.asarray(rsh_cart(xyz, 1))
    np.testing.assert_allclose(out[0], [C0, 0.0, C1, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[1], [C0, 0.0, 0.0, -C1], atol=1e-6)
    np.testing.assert_allclose(out[2], [C0, -C1, 0.0, 0.0], atol=1e-6)


def test_orthonormality_monte_carlo():
    # ∫_{S²} Yi Yj dΩ = δij  →  E_uniform[Yi Yj] * 4π = δij
    rng = np.random.default_rng(0)
    v = rng.normal(size=(200_000, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    basis = np.asarray(rsh_cart(jnp.asarray(v, jnp.float32), 3))  # [M,16]
    gram = basis.T @ basis / basis.shape[0] * 4 * np.pi
    np.testing.assert_allclose(gram, np.eye(16), atol=5e-2)


def test_eval_sh_color_dc_only():
    # DC-only coefficients: rgb = C0 * sh0 + 0.5 for any direction.
    shs = jnp.zeros((5, 4, 3)).at[:, 0, :].set(1.0)
    dirs = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rgb = eval_sh_color(shs, dirs, 1)
    np.testing.assert_allclose(np.asarray(rgb), C0 + 0.5, atol=1e-6)


def test_eval_sh_color_clamped_nonnegative():
    shs = jnp.zeros((1, 4, 3)).at[:, 0, :].set(-10.0)
    rgb = eval_sh_color(shs, jnp.array([[0.0, 0.0, 1.0]]), 1)
    assert np.all(np.asarray(rgb) == 0.0)
