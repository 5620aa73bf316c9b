"""LVMOGP: multi-output regression with a variational latent output embedding.

Reference: GPy/models/gp_multiout_regression.py:14 (GPMultioutRegression,
init protocol :58-103, parameters_changed :128-179) and
gp_multiout_regression_md.py:15 (missing-data / indexD variant,
heteroscedastic option) — Dai, Alvarez & Lawrence (NIPS 2017).

TPU design: the Kronecker-factored SVI bound lives in
inference/svi_multiout.py as ONE pure jnp function; this module only owns
the parameterization — q(Xr) as a NormalPosterior with uncertainty, two
inducing sets Z (Mc, input space) and Z_row (Mr, embedding space), and the
low-rank-plus-diagonal matrix-normal q(U) covariance factors
(qU_var_{c,r}_W, qU_var_{c,r}_diag) exactly as the reference parameterizes
them. All reference hand-gradients (parameters_changed) are autodiff.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.model import Model
from ..core.transformations import Logexp
from ..core.variational import NormalPosterior
from ..inference.svi_multiout import (PosteriorMultioutput, _common,
                                      svi_multiout_elbo, svi_multiout_md_elbo)
from ..kern import RBF
from ..likelihoods import Gaussian

__all__ = ["GPMultioutRegression", "GPMultioutRegressionMD"]


def _init_gp_protocol(X, Y, kernel, kernel_row, Xr_dim, Mc, Mr, indexD=None,
                      verbose=False):
    """The reference's init='GP' warm start (gp_multiout_regression.py:58-86):
    (1) sparse GP on the raw data, (2) BGPLVM on its posterior mean at Z,
    (3) seed kernels / Z / q(Xr) / q(U) from the two fits."""
    from ..util.linalg import jitchol
    from .gplvm import BayesianGPLVM
    from .sparse_gp_regression import SparseGPRegression, SparseGPRegressionMD

    if verbose:
        print("Initializing with GP...")
    if indexD is None:
        m_sgp = SparseGPRegression(X, Y, kernel=kernel.copy(), num_inducing=Mc)
    else:
        m_sgp = SparseGPRegressionMD(X, Y, indexD, kernel=kernel.copy(),
                                     num_inducing=Mc)
    m_sgp.likelihood.variance = float(np.var(np.asarray(Y)[~np.isnan(np.asarray(Y))])) * 0.01
    m_sgp.optimize(max_iters=200, messages=verbose)
    post_mean = np.asarray(m_sgp.posterior.mean)          # (Mc, D)
    m_lvm = BayesianGPLVM(post_mean.T.copy(), Xr_dim, kernel=kernel_row.copy(),
                          num_inducing=Mr)
    m_lvm.likelihood.variance = float(np.var(post_mean)) * 0.01
    m_lvm.optimize(max_iters=500, messages=verbose)

    out = {}
    out["kern"] = m_sgp.kern
    # the reference sqrt's both variances: the product kernel's overall
    # scale is shared between the two factors (gp_multiout_regression.py:73)
    out["kern"].variance = float(np.sqrt(np.asarray(m_sgp.kern.variance)))
    out["Z"] = np.asarray(m_sgp.Z).copy()
    out["kern_row"] = m_lvm.kern
    out["kern_row"].variance = float(np.sqrt(np.asarray(m_lvm.kern.variance)))
    out["Z_row"] = np.asarray(m_lvm.Z).copy()
    out["X_row"] = np.asarray(m_lvm.qX.mean).copy()
    out["Xvariance_row"] = np.asarray(m_lvm.qX.variance).copy()
    out["qU_mean"] = np.asarray(m_lvm.posterior.mean).T.copy()   # (Mc, Mr)
    out["qU_var_c_W"] = np.asarray(jitchol(jnp.asarray(m_sgp.posterior.covariance)
                                           + 1e-8 * jnp.eye(Mc)))
    out["qU_var_r_W"] = np.asarray(jitchol(jnp.asarray(m_lvm.posterior.covariance)
                                           + 1e-8 * jnp.eye(Mr)))
    if verbose:
        print("Done.")
    return out


class GPMultioutRegression(Model):
    """Multi-output GP regression (no missing data): every output observed at
    every input row. GPy: gp_multiout_regression.py:14."""

    def __init__(self, X, Y, Xr_dim, kernel=None, kernel_row=None, Z=None,
                 Z_row=None, X_row=None, Xvariance_row=None,
                 num_inducing=(10, 10), qU_var_r_W_dim=None,
                 qU_var_c_W_dim=None, init="GP", name="GPMR"):
        super().__init__(name=name)
        X = np.asarray(X, dtype=float)
        Y = np.asarray(Y, dtype=float)
        N, D = Y.shape
        Mc, Mr = num_inducing
        kernel = kernel or RBF(X.shape[1])
        kernel_row = kernel_row or RBF(Xr_dim, name="kern_row")

        qU_var_c_diag = np.full(Mc, 1e-5)
        qU_var_r_diag = np.full(Mr, 1e-5)
        if init == "GP":
            got = _init_gp_protocol(X, Y, kernel, kernel_row, Xr_dim, Mc, Mr)
            kernel, kernel_row = got["kern"], got["kern_row"]
            Z, Z_row = got["Z"], got["Z_row"]
            X_row, Xvariance_row = got["X_row"], got["Xvariance_row"]
            qU_mean = got["qU_mean"]
            qU_var_c_W, qU_var_r_W = got["qU_var_c_W"], got["qU_var_r_W"]
        else:
            rng = np.random.default_rng(0)
            qU_mean = np.zeros((Mc, Mr))
            qU_var_c_W = rng.standard_normal(
                (Mc, Mc if qU_var_c_W_dim is None else qU_var_c_W_dim)) * 0.01
            qU_var_r_W = rng.standard_normal(
                (Mr, Mr if qU_var_r_W_dim is None else qU_var_r_W_dim)) * 0.01

        if X_row is None:
            # SVD embedding of the outputs (reference :94-97)
            u, s, v = np.linalg.svd(Y)
            X_row = Y.T.dot(u[:, :Xr_dim])
            X_row = X_row / X_row.std(0)
        if Xvariance_row is None:
            Xvariance_row = np.ones((D, Xr_dim)) * 1e-4
        rng = np.random.default_rng(0)
        if Z is None:
            Z = X[rng.permutation(N)[:Mc]].copy()
        if Z_row is None:
            Z_row = np.asarray(X_row)[rng.permutation(D)[:Mr]].copy()

        self.kern = kernel
        self.kern_row = kernel_row
        self.X_row = NormalPosterior(X_row, Xvariance_row, name="Xr")
        self._add_param("Z", np.asarray(Z, dtype=float))
        self._add_param("Z_row", np.asarray(Z_row, dtype=float))
        self._add_param("qU_mean", qU_mean)
        self._add_param("qU_var_c_W", qU_var_c_W)
        self._add_param("qU_var_c_diag", qU_var_c_diag, transform=Logexp())
        self._add_param("qU_var_r_W", qU_var_r_W)
        self._add_param("qU_var_r_diag", qU_var_r_diag, transform=Logexp())
        self.likelihood = Gaussian(variance=float(np.var(Y)) * 0.01)
        self.__dict__["X"] = jnp.asarray(X)
        self.__dict__["Y"] = jnp.asarray(Y)
        self.__dict__["output_dim"] = D

    # --- q(U) covariance factors: W W' + diag (reference :129-130) --------
    def _qU_cov(self):
        Wc = jnp.asarray(self.qU_var_c_W)
        Wr = jnp.asarray(self.qU_var_r_W)
        Sc = Wc @ Wc.T + jnp.diag(jnp.asarray(self.qU_var_c_diag))
        Sr = Wr @ Wr.T + jnp.diag(jnp.asarray(self.qU_var_r_diag))
        return Sr, Sc

    def _elbo_args(self):
        Sr, Sc = self._qU_cov()
        return (self.kern_row, self.kern, self.X_row, self.X,
                jnp.asarray(self.Z_row), jnp.asarray(self.Z),
                self.likelihood.gaussian_variance(None),
                jnp.asarray(self.qU_mean), Sr, Sc)

    def log_likelihood(self):
        (kr, kc, qXr, X, Zr, Zc, s2, mu, Sr, Sc) = self._elbo_args()
        return (svi_multiout_elbo(kr, kc, qXr, X, Zr, Zc, s2, self.Y, mu, Sr, Sc)
                - self.X_row.KL())

    @property
    def posterior(self):
        (kr, kc, qXr, X, Zr, Zc, s2, mu, Sr, Sc) = self._elbo_args()
        cm = _common(kr, kc, qXr, Zr, Zc, mu, Sr, Sc)
        return PosteriorMultioutput(cm, kc, Zc)

    def predict(self, Xnew, include_likelihood=True):
        mu, var = self.posterior._raw_predict(Xnew)
        if include_likelihood:
            var = var + self.likelihood.gaussian_variance(None)
        return np.asarray(mu), np.asarray(var)

    def predict_noiseless(self, Xnew):
        return self.predict(Xnew, include_likelihood=False)

    @property
    def output_embedding(self):
        """Learned latent coordinates of the outputs (GPy: m.X_row.mean)."""
        return np.asarray(self.X_row.mean)

    def optimize_auto(self, max_iters=1000, verbose=False):
        """Staged optimization protocol (reference :181-195): first adapt the
        variational parameters with hypers fixed, then joint."""
        self.Z.fix()
        self.kern.fix()
        self.kern_row.fix()
        self.Z_row.fix()
        self.X_row.fix()
        self.optimize(max_iters=max(1, int(0.1 * max_iters)), messages=verbose)
        self.Z.unfix()
        self.kern.unfix()
        self.kern_row.unfix()
        self.Z_row.unfix()
        self.X_row.unfix()
        self.optimize(max_iters=max_iters, messages=verbose)


class GPMultioutRegressionMD(GPMultioutRegression):
    """Missing-data variant: stacked observations with per-row output index.

    GPy: gp_multiout_regression_md.py:15. X: (N, Qc), Y: (N, 1), indexD[n]
    in [0, D). heter_noise=True gives each output its own noise variance."""

    def __init__(self, X, Y, indexD, Xr_dim, kernel=None, kernel_row=None,
                 Z=None, Z_row=None, X_row=None, Xvariance_row=None,
                 num_inducing=(10, 10), qU_var_r_W_dim=None,
                 qU_var_c_W_dim=None, init="GP", heter_noise=False,
                 name="GPMRMD"):
        Model.__init__(self, name=name)
        X = np.asarray(X, dtype=float)
        Y = np.asarray(Y, dtype=float).reshape(-1, 1)
        indexD = np.asarray(indexD).astype(int).reshape(-1)
        N = Y.shape[0]
        D = int(indexD.max()) + 1
        Mc, Mr = num_inducing
        if Mr > D:
            raise ValueError(
                f"Number of inducing points ({Mr}) in latent space must be "
                f"<= output dim ({D})")
        kernel = kernel or RBF(X.shape[1])
        kernel_row = kernel_row or RBF(Xr_dim, name="kern_row")

        qU_var_c_diag = np.full(Mc, 1e-5)
        qU_var_r_diag = np.full(Mr, 1e-5)
        if init == "GP":
            got = _init_gp_protocol(X, Y, kernel, kernel_row, Xr_dim, Mc, Mr,
                                    indexD=indexD)
            kernel, kernel_row = got["kern"], got["kern_row"]
            Z, Z_row = got["Z"], got["Z_row"]
            X_row, Xvariance_row = got["X_row"], got["Xvariance_row"]
            qU_mean = got["qU_mean"]
            qU_var_c_W, qU_var_r_W = got["qU_var_c_W"], got["qU_var_r_W"]
        else:
            rng = np.random.default_rng(0)
            qU_mean = np.zeros((Mc, Mr))
            qU_var_c_W = rng.standard_normal(
                (Mc, Mc if qU_var_c_W_dim is None else qU_var_c_W_dim)) * 0.01
            qU_var_r_W = rng.standard_normal(
                (Mr, Mr if qU_var_r_W_dim is None else qU_var_r_W_dim)) * 0.01

        rng = np.random.default_rng(0)
        if X_row is None:
            X_row = rng.standard_normal((D, Xr_dim))
        if Xvariance_row is None:
            Xvariance_row = np.ones((D, Xr_dim)) * 1e-4
        if Z is None:
            Z = X[rng.permutation(N)[:Mc]].copy()
        if Z_row is None:
            Z_row = np.asarray(X_row)[rng.permutation(D)[:Mr]].copy()

        self.kern = kernel
        self.kern_row = kernel_row
        self.X_row = NormalPosterior(X_row, Xvariance_row, name="Xr")
        self._add_param("Z", np.asarray(Z, dtype=float))
        self._add_param("Z_row", np.asarray(Z_row, dtype=float))
        self._add_param("qU_mean", qU_mean)
        self._add_param("qU_var_c_W", qU_var_c_W)
        self._add_param("qU_var_c_diag", qU_var_c_diag, transform=Logexp())
        self._add_param("qU_var_r_W", qU_var_r_W)
        self._add_param("qU_var_r_diag", qU_var_r_diag, transform=Logexp())
        if heter_noise:
            noise0 = np.array([np.var(Y[indexD == d]) * 0.01 + 1e-8
                               for d in range(D)])
        else:
            noise0 = float(np.var(Y)) * 0.01
        self.likelihood = Gaussian(variance=noise0)
        self.heter_noise = bool(heter_noise)
        self.__dict__["X"] = jnp.asarray(X)
        self.__dict__["Y"] = jnp.asarray(Y)
        self.__dict__["indexD"] = jnp.asarray(indexD)
        self.__dict__["output_dim"] = D

    def log_likelihood(self):
        Sr, Sc = self._qU_cov()
        return (svi_multiout_md_elbo(
            self.kern_row, self.kern, self.X_row, self.X,
            jnp.asarray(self.Z_row), jnp.asarray(self.Z),
            self.likelihood.gaussian_variance(None), self.Y, self.indexD,
            self.output_dim, jnp.asarray(self.qU_mean), Sr, Sc)
            - self.X_row.KL())
