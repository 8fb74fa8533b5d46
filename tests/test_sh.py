import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantsplat_tpu.utils import sh as SH


def test_rgb_sh_roundtrip():
    rgb = jnp.array([[0.2, 0.5, 0.9]])
    np.testing.assert_allclose(SH.sh_to_rgb(SH.rgb_to_sh(rgb)), rgb, atol=1e-6)


def test_deg0_is_direction_independent():
    sh = jax.random.normal(jax.random.PRNGKey(0), (10, 1, 3))
    d1 = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (10, 1))
    d2 = jnp.tile(jnp.array([1.0, 0.0, 0.0]), (10, 1))
    np.testing.assert_allclose(SH.eval_sh(0, sh, d1), SH.eval_sh(0, sh, d2), atol=0)


@pytest.mark.parametrize("deg", [0, 1, 2, 3, 4])
def test_degrees_nest(deg):
    """Evaluating at degree d with higher-order coeffs zeroed == degree d-1 + band d."""
    K = SH.num_sh_coeffs(deg)
    key = jax.random.PRNGKey(deg)
    sh = jax.random.normal(key, (32, K, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(100 + deg), (32, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = SH.eval_sh(deg, sh, dirs)
    assert out.shape == (32, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    if deg > 0:
        sh_zeroed = sh.at[:, SH.num_sh_coeffs(deg - 1) :].set(0.0)
        lower = SH.eval_sh(deg - 1, sh_zeroed[:, : SH.num_sh_coeffs(deg - 1)], dirs)
        np.testing.assert_allclose(SH.eval_sh(deg, sh_zeroed, dirs), lower, atol=1e-5)


@pytest.mark.parametrize("deg", [1, 2, 3])
def test_orthonormality_of_basis(deg):
    """Monte-Carlo check that the implied basis functions are orthonormal on S^2.

    Basis_k(dir) = eval_sh with one-hot coefficients; real SH satisfy
    mean over sphere of B_i*B_j = delta_ij / (4*pi) * 4*pi = delta_ij when
    averaging with uniform sphere measure * 4pi.
    """
    K = SH.num_sh_coeffs(deg)
    n = 200_000
    key = jax.random.PRNGKey(42)
    dirs = jax.random.normal(key, (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    basis = []
    for k in range(K):
        coeffs = jnp.zeros((1, K, 1)).at[0, k, 0].set(1.0)
        basis.append(SH.eval_sh(deg, jnp.broadcast_to(coeffs, (n, K, 1)), dirs)[:, 0])
    B = jnp.stack(basis, axis=1)  # [n, K]
    gram = 4 * jnp.pi * (B.T @ B) / n
    np.testing.assert_allclose(gram, jnp.eye(K), atol=0.05)
