"""GPLVM family + MCMC tests.

GPLVM oracles (GPy old_tests/gplvm pattern): checkgrad incl. dL/dX; BGPLVM
bound <= GPLVM-style marginal; ARD relevance discovers the true latent dim.
HMC oracle: posterior over noise variance on conjugate-ish toy concentrates
near truth; chains api shapes; MH agreement with HMC.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gpy_tpu.models.gplvm import GPLVM, SparseGPLVM, BayesianGPLVM, MRD
from gpy_tpu.models import GPRegression
from gpy_tpu.mcmc import HMC, Metropolis_Hastings
import gpy_tpu

rng = np.random.default_rng(21)


def _lowdim_data(n=30, d_obs=6, q_true=2):
    X = rng.standard_normal((n, q_true))
    W = rng.standard_normal((q_true, d_obs))
    Y = np.tanh(X) @ W + 0.05 * rng.standard_normal((n, d_obs))
    return Y


def test_gplvm_checkgrad():
    Y = _lowdim_data(12, 4)
    m = GPLVM(Y, 2)
    assert m.checkgrad()


def test_gplvm_optimize_reconstructs():
    Y = _lowdim_data(25, 5)
    m = GPLVM(Y, 2)
    m.optimize(max_iters=150)
    # posterior mean at learned X reconstructs Y decently
    mu, _ = m.predict(np.asarray(m.latent_X))
    assert np.sqrt(np.mean((mu - Y) ** 2)) < 0.3


def test_sparse_gplvm_checkgrad():
    Y = _lowdim_data(15, 4)
    m = SparseGPLVM(Y, 2, num_inducing=5)
    assert m.checkgrad()


def test_bgplvm_checkgrad():
    Y = _lowdim_data(12, 4)
    m = BayesianGPLVM(Y, 2, num_inducing=5)
    assert m.checkgrad()


def test_bgplvm_ard_discovers_dimensionality():
    Y = _lowdim_data(40, 8, q_true=2)
    m = BayesianGPLVM(Y, 4, num_inducing=10)
    m.optimize(max_iters=400)
    sens = np.asarray(m.kern.input_sensitivity())
    order = np.sort(sens)[::-1]
    # two dominant latent dimensions
    assert order[1] > 3 * order[2]


def test_bgplvm_infer_newX():
    Y = _lowdim_data(30, 5)
    m = BayesianGPLVM(Y, 2, num_inducing=8)
    m.optimize(max_iters=150)
    qX, bound = m.infer_newX(Y[:3], optimize_iters=150)
    assert qX.mean.shape == (3, 2)
    assert np.isfinite(bound)
    # inferred latents should be close-ish to training latents for same Y
    d = np.linalg.norm(np.asarray(qX.mean) - np.asarray(m.qX.mean)[:3], axis=1)
    assert np.mean(d) < 2.0


def test_mrd_runs_and_checkgrads():
    Y1 = _lowdim_data(12, 3)
    Y2 = _lowdim_data(12, 4)
    m = MRD([Y1, Y2], 3, num_inducing=5)
    assert np.isfinite(float(m.log_likelihood()))
    assert m.checkgrad()
    assert len(m.scales()) == 2


def test_hmc_posterior_concentrates():
    n = 40
    X = np.linspace(0, 5, n).reshape(-1, 1)
    Y = np.sin(X) + 0.15 * rng.standard_normal((n, 1))
    m = GPRegression(X, Y)
    m.kern.variance.set_prior(gpy_tpu.priors.Gamma(2.0, 2.0))
    m.kern.lengthscale.set_prior(gpy_tpu.priors.Gamma(2.0, 2.0))
    m.likelihood.variance.set_prior(gpy_tpu.priors.Gamma(2.0, 20.0))
    m.optimize(max_iters=100)
    hmc = HMC(m, stepsize=2e-2)
    s = hmc.sample(num_samples=300, adapt_steps=100, seed=0)
    assert s.shape == (300, 3)
    noise_post = s[:, -1]  # likelihood.variance is the last param
    assert 0.005 < np.median(noise_post) < 0.1
    assert hmc._accept_rate > 0.5


def test_hmc_multichain_shapes():
    n = 20
    X = np.linspace(0, 5, n).reshape(-1, 1)
    Y = np.sin(X) + 0.1 * rng.standard_normal((n, 1))
    m = GPRegression(X, Y)
    hmc = HMC(m, stepsize=1e-2, num_leapfrog=5)
    s = hmc.sample(num_samples=50, num_chains=4, adapt_steps=20, seed=1)
    assert s.shape == (4, 50, 3)
    assert np.all(np.isfinite(s))


def test_hmc_sharded_chains_on_mesh():
    from gpy_tpu.parallel import make_mesh

    n = 16
    X = np.linspace(0, 5, n).reshape(-1, 1)
    Y = np.sin(X) + 0.1 * rng.standard_normal((n, 1))
    m = GPRegression(X, Y)
    mesh = make_mesh(8, axis_name="chains")
    hmc = HMC(m, stepsize=1e-2, num_leapfrog=3)
    s = hmc.sample(num_samples=20, num_chains=8, mesh=mesh, seed=2)
    assert s.shape == (8, 20, 3)
    assert np.all(np.isfinite(s))


def test_mh_sampler():
    n = 25
    X = np.linspace(0, 5, n).reshape(-1, 1)
    Y = np.sin(X) + 0.15 * rng.standard_normal((n, 1))
    m = GPRegression(X, Y)
    m.optimize(max_iters=50)
    mh = Metropolis_Hastings(m, cov=0.005 * np.eye(3))
    s = mh.sample(Ntotal=2000, Nburn=500, Nthin=5, seed=0)
    assert s.shape[1] == 3
    assert np.all(np.isfinite(s))
    assert 0.002 < np.median(s[:, -1]) < 0.2


def test_hmc_shortcut():
    from gpy_tpu.mcmc import HMC_shortcut

    n = 20
    X = np.linspace(0, 5, n).reshape(-1, 1)
    Y = np.sin(X) + 0.1 * rng.standard_normal((n, 1))
    m = GPRegression(X, Y)
    hmc = HMC_shortcut(m, stepsize=1e-2, num_leapfrog=5)
    s = hmc.sample(num_samples=50, seed=3)
    assert s.shape == (50, 3)
    assert np.all(np.isfinite(s))


def test_hmc_sampler_cache_no_retrace_across_seeds():
    """Fresh seeds/stepsizes must re-execute the SAME compiled sampler —
    round-2's bench measured recompilation because the seed was a trace
    constant."""
    import numpy as np
    from gpy_tpu.mcmc import HMC
    from gpy_tpu.models import GPRegression

    rng = np.random.default_rng(0)
    X = rng.random((60, 2))
    Y = np.sin(X[:, :1]) + 0.1 * rng.standard_normal((60, 1))
    m = GPRegression(X, Y, noise_var=0.1)
    h = HMC(m, stepsize=5e-3, num_leapfrog=3)
    h.sample(num_samples=6, num_chains=2, seed=0)
    h.stepsize = 7e-3
    h.sample(num_samples=6, num_chains=2, seed=9)
    (fn,) = h._sample_cache.values()
    assert fn._cache_size() == 1  # one trace for both seeds and stepsizes
    # a different chain count is a new executable, not a retrace of the old
    h.sample(num_samples=6, num_chains=4, seed=1)
    assert len(h._sample_cache) == 2
