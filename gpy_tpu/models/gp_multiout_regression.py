"""SVI multi-output regression with a learned output embedding.

Reference: GPy/models/gp_multiout_regression.py:14 and
gp_multiout_regression_md.py:15 (+ inference/vardtc_svi_multiout{_miss}.py,
747 LoC of specialized Kronecker SVI bounds).

TPU design: the model — outputs correlated through a latent row embedding
Xr with a row kernel — is expressed as one stochastic variational GP on the
stacked (x, output) input with kernel k_c(x,x') * k_r(xr_d, xr_d'), where
the output-embedding rows Xr are ordinary trainable leaves. The SVGP machinery
(minibatching + natural gradients, core/svgp.py) replaces the bespoke SVI
bound; missing data (MD variant) = simply omitting the missing rows from the
stack.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.svgp import SVGP
from ..kern import RBF
from ..kern.kern import Kern
from ..likelihoods import Gaussian
from ..util import multioutput

__all__ = ["GPMultioutRegression", "GPMultioutRegressionMD"]


class _EmbeddingCoregionalize(Kern):
    """B[d, d'] = k_row(xr_d, xr_d') with trainable embedding rows Xr.

    The learned-embedding generalization of Coregionalize (B = WW' + diag k)."""

    def __init__(self, num_outputs, Xr_dim, kern_row=None, active_dims=None, name="coreg_embed"):
        super().__init__(1, active_dims, name)
        self.num_outputs = int(num_outputs)
        rng = np.random.default_rng(0)
        self._add_param("Xr", 0.5 * rng.standard_normal((num_outputs, Xr_dim)))
        self.kern_row = kern_row or RBF(Xr_dim, name="kern_row")

    @property
    def B(self):
        Xr = jnp.asarray(self.Xr)
        return self.kern_row.K(Xr) + 1e-8 * jnp.eye(self.num_outputs)

    def K(self, X, X2=None):
        X = self._slice(X)
        i1 = jnp.asarray(X[:, 0], dtype=jnp.int32)
        i2 = i1 if X2 is None else jnp.asarray(self._slice(X2)[:, 0], dtype=jnp.int32)
        return self.B[jnp.ix_(i1, i2)]

    def Kdiag(self, X):
        X = self._slice(X)
        i1 = jnp.asarray(X[:, 0], dtype=jnp.int32)
        return jnp.diagonal(self.B)[i1]


class GPMultioutRegression(SVGP):
    def __init__(self, X, Y, Xr_dim, kernel=None, kernel_row=None, Z=None,
                 num_inducing=(10,), qU_var_r_W_dim=None, qU_var_c_W_dim=None,
                 init="GP", name="GPMR"):
        X = np.asarray(X, dtype=float)
        Y = np.asarray(Y, dtype=float)
        N, D = Y.shape
        Xs, Ys, _ = multioutput.build_XY([X] * D, [Y[:, d:d + 1] for d in range(D)])
        input_dim = X.shape[1]
        kc = kernel or RBF(input_dim, active_dims=list(range(input_dim)), name="kern_col")
        kr = _EmbeddingCoregionalize(D, Xr_dim, kernel_row, active_dims=[input_dim])
        M = num_inducing[0] if isinstance(num_inducing, (tuple, list)) else int(num_inducing)
        rng = np.random.default_rng(0)
        Zc = Xs[rng.permutation(Xs.shape[0])[:M]].copy()
        super().__init__(Xs, Ys, Zc, kc * kr, Gaussian(variance=0.1 * float(np.var(Y))),
                         name=name)

    @property
    def output_embedding(self):
        """Learned latent coordinates of the outputs (GPy: m.X_row)."""
        coreg = self.kern.parts[1]
        return np.asarray(coreg.Xr)


class GPMultioutRegressionMD(GPMultioutRegression):
    """Missing-data variant: per-output observation lists.

    GPy: gp_multiout_regression_md.py:15. Rows simply aren't stacked for
    missing entries."""

    def __init__(self, X_list, Y_list, Xr_dim, kernel=None, kernel_row=None,
                 num_inducing=(10,), name="GPMRMD"):
        D = len(Y_list)
        Xs, Ys, _ = multioutput.build_XY(
            [np.asarray(x, dtype=float) for x in X_list],
            [np.asarray(y, dtype=float) for y in Y_list],
        )
        input_dim = np.asarray(X_list[0]).shape[1]
        kc = kernel or RBF(input_dim, active_dims=list(range(input_dim)), name="kern_col")
        kr = _EmbeddingCoregionalize(D, Xr_dim, kernel_row, active_dims=[input_dim])
        M = num_inducing[0] if isinstance(num_inducing, (tuple, list)) else int(num_inducing)
        rng = np.random.default_rng(0)
        Zc = Xs[rng.permutation(Xs.shape[0])[:M]].copy()
        SVGP.__init__(self, Xs, Ys, Zc, kc * kr,
                      Gaussian(variance=0.1 * float(np.var(Ys))), name=name)
