"""Phase function tests: reference-constant values, sampling
distributions (chi-square-free moment checks)."""

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.core import phase


def test_hg_reference_constant():
    """Reference HG uses pi/4 leading constant (light.h:61)."""
    val = float(phase.henyey_greenstein(jnp.float32(1.0), 0.0))
    np.testing.assert_allclose(val, np.pi / 4, rtol=1e-6)


def test_hg_normalized_isotropic():
    val = float(phase.henyey_greenstein(jnp.float32(0.3), 0.0, normalized=True))
    np.testing.assert_allclose(val, 1.0 / (4 * np.pi), rtol=1e-6)


def test_hg_normalized_integrates_to_one():
    """∫ p(cosθ) dΩ = 1 for the physically normalized variant."""
    mu = np.linspace(-1, 1, 20001)
    for g in (0.0, 0.4, -0.7):
        p = np.asarray(phase.henyey_greenstein(jnp.asarray(mu, jnp.float32),
                                               g, normalized=True))
        integral = 2 * np.pi * np.trapezoid(p, mu)
        np.testing.assert_allclose(integral, 1.0, rtol=2e-3)


def test_sample_hg_mean_cosine():
    """E[cosθ] of HG samples equals g."""
    key = jax.random.PRNGKey(0)
    wo = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (20000, 3))
    for g in (0.0, 0.5, -0.3):
        new_dir, _ = phase.sample_hg(wo, key, jnp.float32(g))
        cos = np.asarray(jnp.sum(new_dir * wo, axis=-1))
        assert abs(cos.mean() - g) < 0.02, (g, cos.mean())
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(new_dir), axis=-1), 1.0, atol=1e-4)


def test_sample_spherical_uniform():
    key = jax.random.PRNGKey(1)
    wi, pdf = phase.sample_spherical(key, (20000,))
    wi = np.asarray(wi)
    assert abs(wi.mean(axis=0)).max() < 0.02
    np.testing.assert_allclose(np.asarray(pdf), 1.0 / (4 * np.pi), rtol=1e-6)


def test_power_heuristic():
    np.testing.assert_allclose(
        float(phase.power_heuristic(1, 1.0, 1, 1.0)), 0.5)
    np.testing.assert_allclose(
        float(phase.power_heuristic(1, 2.0, 1, 0.0)), 1.0)
