"""Kernel base class and combination kernels (Sum/Prod).

Reference: GPy/kern/src/kern.py (Kern API: K:125, Kdiag:138, psi0/1/2:146-170,
gradients_X:172, add:310, prod:339; CombinationKernel:363) and the
active_dims slicing metaclass GPy/kern/src/kernel_slice_operations.py:19-57.

TPU design: a kernel is a `Module` (pytree of constrained params) whose
`K(X, X2)` is a pure jnp function — `update_gradients_full`, `dK_dr`,
`Cache_this`, and the slicing metaclass all disappear. active_dims slicing is
a plain `_slice` call (a static column gather, free under XLA); gradients wrt
anything (params, X, psi statistics) come from autodiff. `gradients_X` is kept
as a convenience wrapper over `jax.grad` for API parity.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..core.module import Module

__all__ = ["Kern", "CombinationKernel", "Add", "Prod"]


class Kern(Module):
    def __init__(self, input_dim: int, active_dims=None, name: str = "kern"):
        super().__init__(name=name)
        self.input_dim = int(input_dim)
        if active_dims is None:
            active_dims = np.arange(input_dim)
        self.active_dims = np.asarray(active_dims, dtype=np.int64).reshape(-1)
        assert self.active_dims.size == self.input_dim, "active_dims must have input_dim entries"
        self._all_dims = self.active_dims  # effective columns this kernel reads

    # --- slicing (replaces KernCallsViaSlicerMeta) ------------------------
    def _slice(self, X):
        if X is None:
            return None
        if X.shape[-1] == self.input_dim and np.array_equal(
            self.active_dims, np.arange(self.input_dim)
        ):
            return X
        return X[..., self.active_dims]

    # --- covariance API ---------------------------------------------------
    def K(self, X, X2=None):
        raise NotImplementedError

    def Kdiag(self, X):
        raise NotImplementedError

    # --- uncertain-input psi statistics (GPy kern.py:146-170) -------------
    # qX: NormalPosterior-like with .mean (N,Q) and .variance (N,Q)
    def psi0(self, Z, qX):
        from .psi_comp import psi0_quadrature

        return psi0_quadrature(self, Z, qX)

    def psi1(self, Z, qX):
        from .psi_comp import psi1_quadrature

        return psi1_quadrature(self, Z, qX)

    def psi2(self, Z, qX):
        """sum_n psi2n — (M, M)."""
        return jnp.sum(self.psi2n(Z, qX), axis=0)

    def psi2n(self, Z, qX):
        from .psi_comp import psi2n_quadrature

        return psi2n_quadrature(self, Z, qX)

    # --- autodiff conveniences (parity with GPy's hand-written versions) --
    def gradients_X(self, dL_dK, X, X2=None):
        """dL/dX where L = sum(dL_dK * K(X, X2)). GPy: kern.py:172."""
        if X2 is None:
            f = lambda x: jnp.sum(dL_dK * self.K(x))
        else:
            f = lambda x: jnp.sum(dL_dK * self.K(x, X2))
        return jax.grad(f)(jnp.asarray(X, dtype=jnp.result_type(float)))

    def gradients_X_diag(self, dL_dKdiag, X):
        f = lambda x: jnp.sum(dL_dKdiag * self.Kdiag(x))
        return jax.grad(f)(jnp.asarray(X, dtype=jnp.result_type(float)))

    def input_sensitivity(self, summarize: bool = True):
        """ARD relevance per input dim. GPy: kern.py:260."""
        return np.zeros(self.input_dim)

    # --- composition ------------------------------------------------------
    def __add__(self, other):
        assert isinstance(other, Kern)
        return Add([self, other])

    def __mul__(self, other):
        assert isinstance(other, Kern)
        return Prod([self, other])

    def _effective_input_dim(self, other):
        return int(max(self._all_dims.max(), other._all_dims.max()) + 1)


class CombinationKernel(Kern):
    def __init__(self, kernels: Sequence[Kern], name: str):
        all_dims = np.unique(np.concatenate([k._all_dims for k in kernels]))
        input_dim = int(all_dims.max() + 1)
        super().__init__(input_dim, active_dims=np.arange(input_dim), name=name)
        self._all_dims = all_dims
        self.parts = list(kernels)

    def input_sensitivity(self, summarize: bool = True):
        s = np.zeros(self.input_dim)
        for p in self.parts:
            s[p.active_dims] += np.asarray(p.input_sensitivity(summarize)).reshape(-1)
        return s


class Add(CombinationKernel):
    """Sum kernel. GPy: kern/src/add.py (flattens nested sums)."""

    def __init__(self, kernels: Sequence[Kern], name: str = "sum"):
        flat = []
        for k in kernels:
            if isinstance(k, Add):
                flat.extend(k.parts)
            else:
                flat.append(k)
        super().__init__(flat, name)

    def K(self, X, X2=None):
        return sum(p.K(X, X2) for p in self.parts)

    def Kdiag(self, X):
        return sum(p.Kdiag(X) for p in self.parts)

    def psi0(self, Z, qX):
        return sum(p.psi0(Z, qX) for p in self.parts)

    def psi1(self, Z, qX):
        return sum(p.psi1(Z, qX) for p in self.parts)

    def psi2n(self, Z, qX):
        """Includes the cross terms <K_i(x,Z_m) K_j(x,Z_m')>.

        Reference (GPy add.py:180-205) supports only White (zero cross),
        Bias, and RBF/Linear pairs on DISJOINT dims (product of psi1s —
        exact because diagonal q(X) factorizes per dim) and *raises* for
        anything else. Here `cross_psi2n_exact` additionally computes the
        exact closed-form cross for RBF x RBF, RBF x Linear and
        Linear x Linear on OVERLAPPING active_dims; pairs outside that
        family use Gauss-Hermite quadrature when the latent dim admits the
        product grid (exact up to quadrature error), and only fall back to
        the product-of-psi1 approximation — with a warning — beyond that
        (the reference would raise NotImplementedError in all these cases).
        """
        import warnings

        from .psi_comp import cross_psi2n_exact, cross_psi2n_quadrature

        total = sum(p.psi2n(Z, qX) for p in self.parts)
        for i in range(len(self.parts)):
            for j in range(i + 1, len(self.parts)):
                p1, p2 = self.parts[i], self.parts[j]
                cross = cross_psi2n_exact(p1, p2, Z, qX)
                if cross is None:
                    Q = jnp.asarray(qX.mean).shape[1]
                    if Q <= 4 and not hasattr(qX, "gamma"):
                        cross = cross_psi2n_quadrature(p1, p2, Z, qX)
                    else:
                        warnings.warn(
                            f"Add.psi2: no exact cross term for "
                            f"{type(p1).__name__} x {type(p2).__name__} on "
                            f"overlapping active_dims (Q={Q}); using the "
                            f"product-of-psi1 approximation (biased bound).",
                            stacklevel=2)
                        cross = (p1.psi1(Z, qX)[:, :, None]
                                 * p2.psi1(Z, qX)[:, None, :])
                total = total + cross + jnp.swapaxes(cross, 1, 2)
        return total


class Prod(CombinationKernel):
    """Product kernel. GPy: kern/src/prod.py."""

    def __init__(self, kernels: Sequence[Kern], name: str = "mul"):
        flat = []
        for k in kernels:
            if isinstance(k, Prod):
                flat.extend(k.parts)
            else:
                flat.append(k)
        super().__init__(flat, name)

    def K(self, X, X2=None):
        out = self.parts[0].K(X, X2)
        for p in self.parts[1:]:
            out = out * p.K(X, X2)
        return out

    def Kdiag(self, X):
        out = self.parts[0].Kdiag(X)
        for p in self.parts[1:]:
            out = out * p.Kdiag(X)
        return out
