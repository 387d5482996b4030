"""IR-SDE schedule & sampler tests: closed-form unit checks + golden parity against
the reference sde_utils.py (when the reference checkout is present)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daclip_tpu.sde import IRSDE, make_schedule
from tests.conftest import requires_reference


def test_schedule_shapes_and_basic_identities():
    sde = IRSDE(max_sigma=50, T=100, schedule="cosine", eps=0.005)
    s = sde.np_schedule
    assert s.thetas.shape == (101,)
    assert s.sigma_bars.shape == (101,)
    # theta-bar_0 == 0, sigma-bar_0 == 0
    assert s.thetas_cumsum[0] == 0.0
    assert s.sigma_bars[0] == 0.0
    # dt satisfies e^{-theta-bar_T dt} = eps
    assert math.isclose(math.exp(-s.thetas_cumsum[-1] * s.dt), 0.005, rel_tol=1e-5)
    # sigma-bar_T == max_sigma * sqrt(1-eps^2)
    assert math.isclose(s.sigma_bars[-1], sde.max_sigma * math.sqrt(1 - 0.005 ** 2),
                        rel_tol=1e-5)
    # max_sigma >= 1 is a 0-255 scale value
    assert sde.max_sigma == 50 / 255


@pytest.mark.parametrize("schedule", ["constant", "linear", "cosine"])
def test_mu_bar_interpolates(schedule):
    sde = IRSDE(max_sigma=0.2, T=50, schedule=schedule)
    x0 = jnp.ones((2, 4, 4, 3)) * 0.8
    mu = jnp.zeros((2, 4, 4, 3))
    # t=0: mu_bar == x0 ; t=T: mu_bar ~ mu + eps*(x0-mu)
    np.testing.assert_allclose(sde.mu_bar(mu, x0, jnp.array(0)), x0, rtol=1e-6)
    far = sde.mu_bar(mu, x0, jnp.array(50))
    np.testing.assert_allclose(np.asarray(far), 0.8 * 0.005, atol=1e-4)


def test_optimum_posterior_is_exact_inverse():
    """Rolling the oracle posterior from x_T(mean) back must land near x0."""
    sde = IRSDE(max_sigma=0.1, T=100)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (1, 8, 8, 3))
    mu = jnp.zeros_like(x0) + 0.5
    xT = sde.mu_bar(mu, x0, jnp.array(sde.T))
    xhat = sde.optimal_reverse(xT, x0, mu)
    np.testing.assert_allclose(np.asarray(xhat), np.asarray(x0), atol=1e-4)


def test_get_init_state_from_noise_roundtrip():
    sde = IRSDE(max_sigma=0.1, T=100)
    key = jax.random.PRNGKey(1)
    x0 = jax.random.uniform(key, (2, 4, 4, 3))
    mu = jnp.zeros_like(x0)
    t = jnp.array([[[[37]]], [[[80]]]], dtype=jnp.int32)
    noise = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    xt = sde.mu_bar(mu, x0, t) + sde.sigma_bar(t) * noise
    x0_hat = sde.get_init_state_from_noise(xt, noise, mu, t)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-5)


def test_posterior_sampler_with_oracle_noise_restores():
    """With the true-noise oracle as the model, posterior sampling recovers x0."""
    sde = IRSDE(max_sigma=0.2, T=100)
    key = jax.random.PRNGKey(3)
    x0 = jax.random.uniform(key, (1, 8, 8, 3))
    mu = x0 + 0.3  # LQ image

    def oracle_noise_fn(x, mu_, tb):
        t = tb[0].astype(jnp.int32)
        return sde.get_real_noise(x, x0, mu_, t)

    xT = sde.noise_state(jax.random.PRNGKey(4), mu)
    out = jax.jit(lambda xt, k: sde.reverse_posterior(oracle_noise_fn, xt, mu, k))(
        xT, jax.random.PRNGKey(5))
    assert np.mean(np.abs(np.asarray(out - x0))) < 0.05


def test_samplers_deterministic_given_key():
    sde = IRSDE(max_sigma=0.2, T=20)
    x = jnp.ones((1, 4, 4, 3)) * 0.5
    mu = jnp.zeros_like(x)

    def noise_fn(xt, mu_, tb):
        return xt * 0.1

    a = sde.reverse_posterior(noise_fn, x, mu, jax.random.PRNGKey(7))
    b = sde.reverse_posterior(noise_fn, x, mu, jax.random.PRNGKey(7))
    c = sde.reverse_posterior(noise_fn, x, mu, jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a - c)).max() > 0


def test_generate_random_states_stats():
    sde = IRSDE(max_sigma=0.3, T=100)
    x0 = jnp.zeros((64, 4, 4, 3))
    mu = jnp.ones_like(x0)
    t, xt = sde.generate_random_states(jax.random.PRNGKey(0), x0, mu)
    assert t.shape == (64, 1, 1, 1)
    assert int(t.min()) >= 1 and int(t.max()) <= 100
    assert xt.dtype == jnp.float32
    # states lie between x0 and mu plus bounded noise
    assert np.abs(np.asarray(xt)).max() < 1 + 5 * 0.3


@requires_reference
class TestGoldenVsTorchReference:
    """Bit-level schedule parity vs the upstream sde_utils.py implementation."""

    @pytest.fixture(scope="class")
    def ref(self):
        from tests.parity.refload import load_ref_sde
        return load_ref_sde()

    @pytest.mark.parametrize("schedule", ["constant", "linear", "cosine"])
    def test_schedule_tables(self, ref, schedule):
        import torch
        rsde = ref.IRSDE(max_sigma=50, T=100, schedule=schedule, eps=0.005,
                         device=torch.device("cpu"))
        ours = make_schedule(50 / 255, 100, schedule, eps=0.005)
        np.testing.assert_allclose(ours.thetas, rsde.thetas.numpy(), rtol=1e-6,
                                   atol=2e-7)
        np.testing.assert_allclose(ours.sigmas, rsde.sigmas.numpy(), rtol=1e-6,
                                   atol=5e-7)
        np.testing.assert_allclose(ours.thetas_cumsum, rsde.thetas_cumsum.numpy(),
                                   rtol=1e-6, atol=5e-7)
        np.testing.assert_allclose(ours.sigma_bars, rsde.sigma_bars.numpy(),
                                   rtol=1e-5, atol=5e-7)
        assert math.isclose(ours.dt, float(rsde.dt), rel_tol=1e-6)

    def test_posterior_coefficients(self, ref):
        import torch
        rsde = ref.IRSDE(max_sigma=50, T=100, schedule="cosine", eps=0.005,
                         device=torch.device("cpu"))
        ours = make_schedule(50 / 255, 100, "cosine", eps=0.005)
        # The reference evaluates these in float32 and suffers cancellation in
        # (1-e^{-2 theta-bar_t dt}) at small t; our f64 tables are more accurate, so
        # tolerance is loose at t<=2 and tight elsewhere.
        for t in [1, 2, 17, 50, 99, 100]:
            rtol = 1e-3 if t <= 2 else 2e-5
            xt = torch.randn(1, 3, 8, 8)
            x0 = torch.randn(1, 3, 8, 8)
            rsde.mu = 0.0
            want = rsde.reverse_optimum_step(xt, x0, t).numpy()
            got = (ours.post_term1[t] * xt.numpy()
                   + ours.post_term2[t] * x0.numpy())
            np.testing.assert_allclose(got, want, rtol=rtol,
                                       atol=1e-4 if t <= 2 else 1e-6)
            want_std = float(rsde.reverse_optimum_std(t))
            np.testing.assert_allclose(ours.post_std[t], want_std, rtol=max(rtol, 1e-4))

    def test_x0_recovery_matches(self, ref):
        import torch
        rsde = ref.IRSDE(max_sigma=50, T=100, schedule="cosine", eps=0.005,
                         device=torch.device("cpu"))
        rsde.mu = 0.0
        sde = IRSDE(max_sigma=50, T=100)
        xt = torch.randn(2, 3, 4, 4)
        noise = torch.randn(2, 3, 4, 4)
        for t in [1, 33, 100]:
            want = rsde.get_init_state_from_noise(xt, noise, t).numpy()
            got = np.asarray(sde.get_init_state_from_noise(
                jnp.asarray(xt.numpy()), jnp.asarray(noise.numpy()), 0.0, t))
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)
