"""PCA with automatic primal/dual solve and NaN-tolerant centering.

Reference: GPy/util/pca.py:18 (PCA class used by latent-space plotting and
dimensionality-reduction examples). numpy implementation (host-side init
tool, not a traced loss component).
"""
from __future__ import annotations

import numpy as np

__all__ = ["PCA"]


class PCA:
    """Eigendecomposition PCA; primal (covariance) if N >= D, else dual
    (Gram) — identical spectra, cheaper in the smaller dimension."""

    def __init__(self, X):
        X = np.array(X, dtype=float)
        self.mu = np.nanmean(X, axis=0)
        self.sigma = np.nanstd(X, axis=0)
        Xc = self._center(X)
        if Xc.shape[0] >= Xc.shape[1]:
            vals, vecs = np.linalg.eigh(Xc.T @ Xc)
        else:
            dvals, dvecs = np.linalg.eigh(Xc @ Xc.T)
            vecs = Xc.T @ dvecs
            norms = np.sqrt((vecs**2).sum(0))
            vecs = vecs / np.where(norms == 0, 1e-30, norms)
            vals = dvals
        order = np.argsort(vals)[::-1]
        self.eigvals = np.clip(vals[order], 0.0, np.inf)
        self.eigvectors = vecs[:, order]
        self.fracs = self.eigvals / max(self.eigvals.sum(), 1e-300)
        self.Q = self.eigvals.shape[0]

    def _center(self, X):
        X = np.where(np.isnan(X), self.mu, X)
        return (X - self.mu) / np.where(self.sigma == 0, 1e-30, self.sigma)

    def project(self, X, Q=None):
        """Project (new) data onto the first Q principal components."""
        Q = self.Q if Q is None else Q
        return self._center(np.array(X, dtype=float)) @ self.eigvectors[:, :Q]

    def plot_fracs(self, Q=None, ax=None):
        """Bar plot of the eigenvalue fractions (GPy pca.py plot_fracs)."""
        import matplotlib.pyplot as plt

        Q = self.Q if Q is None else Q
        if ax is None:
            _, ax = plt.subplots()
        ax.bar(np.arange(Q), self.fracs[:Q])
        ax.set_xlabel("PC")
        ax.set_ylabel("eigenvalue fraction")
        return ax
