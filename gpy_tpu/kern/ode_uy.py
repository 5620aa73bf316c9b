"""ODE_UY — joint covariance for a first-order ODE pair (U drives Y).

Reference: GPy/kern/src/ODE_UY.py (282 LoC): model a dy/dt + b y = U with
Matern-3/2 prior on U; X = [t, index] with index 0 = U rows, 1 = Y rows.
The python slice loops become index masks; gradients are autodiff.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.transformations import Logexp
from .kern import Kern

__all__ = ["ODE_UY", "ODE_UYC", "ODE_st", "ODE_t"]


class ODE_UY(Kern):
    def __init__(self, input_dim=2, variance_U=3.0, variance_Y=1.0,
                 lengthscale_U=1.0, lengthscale_Y=1.0, active_dims=None, name="ode_uy"):
        assert input_dim == 2, "only defined for 2 input dims (t + index)"
        super().__init__(input_dim, active_dims, name)
        self._add_param("variance_U", variance_U, transform=Logexp())
        self._add_param("variance_Y", variance_Y, transform=Logexp())
        self._add_param("lengthscale_U", lengthscale_U, transform=Logexp())
        self._add_param("lengthscale_Y", lengthscale_Y, transform=Logexp())

    def K(self, X, X2=None):
        t1 = X[:, :1]
        i1 = jnp.asarray(X[:, 1], dtype=jnp.int32)
        if X2 is None:
            t2, i2 = t1, i1
        else:
            t2 = X2[:, :1]
            i2 = jnp.asarray(X2[:, 1], dtype=jnp.int32)
        rdist = t1 - t2.T
        ad = jnp.abs(rdist)
        ly = 1.0 / jnp.asarray(self.lengthscale_Y)
        lu = np.sqrt(3.0) / jnp.asarray(self.lengthscale_U)
        Vu = jnp.asarray(self.variance_U)
        Vy = jnp.asarray(self.variance_Y)

        kuu = Vu * (1 + lu * ad) * jnp.exp(-lu * ad)

        k1 = jnp.exp(-ly * ad) * (2 * lu + ly) / (lu + ly) ** 2
        k2 = (
            jnp.exp(-lu * ad) * (ly - 2 * lu + lu * ly * ad - lu**2 * ad)
            + jnp.exp(-ly * ad) * (2 * lu - ly)
        ) / (ly - lu) ** 2
        k3 = jnp.exp(-lu * ad) * ((1 + lu * ad) / (lu + ly) + lu / (lu + ly) ** 2)
        kyy = Vu * Vy * (k1 + k2 + k3)

        kyu3 = lambda d: jnp.exp(-lu * d) / (lu + ly) * (1 + lu * (d + 1 / (lu + ly)))
        k1cros = lambda d: jnp.exp(ly * d) / (lu - ly) * (
            1 - jnp.exp((lu - ly) * d)
            + lu * (d * jnp.exp((lu - ly) * d) + (1 - jnp.exp((lu - ly) * d)) / (lu - ly))
        )
        k2cros = lambda d: jnp.exp(ly * d) * (1 / (lu + ly) + lu / (lu + ly) ** 2)
        Vyu = jnp.sqrt(Vy * ly * 2)
        kuyp = Vu * Vyu * kyu3(rdist)                       # t1 - t2 > 0, (U,Y)
        kuyn = Vu * Vyu * (k1cros(rdist) + k2cros(rdist))   # t1 - t2 < 0, (U,Y)
        kuy = jnp.where(rdist > 0, kuyp, kuyn)
        kyup = Vu * Vyu * (k1cros(-rdist) + k2cros(-rdist))  # (Y,U), t1 - t2 > 0
        kyun = Vu * Vyu * kyu3(-rdist)
        kyu = jnp.where(rdist > 0, kyup, kyun)

        mU1 = (i1 == 0)[:, None]
        mU2 = (i2 == 0)[None, :]
        out = jnp.where(
            mU1 & mU2, kuu,
            jnp.where(mU1 & ~mU2, kuy, jnp.where(~mU1 & mU2, kyu, kyy)),
        )
        return out

    def Kdiag(self, X):
        i1 = jnp.asarray(X[:, 1], dtype=jnp.int32)
        ly = 1.0 / jnp.asarray(self.lengthscale_Y)
        lu = np.sqrt(3.0) / jnp.asarray(self.lengthscale_U)
        Vu = jnp.asarray(self.variance_U)
        Vy = jnp.asarray(self.variance_Y)
        kyy0 = Vu * Vy * (
            (2 * lu + ly) / (lu + ly) ** 2
            + (ly - 2 * lu + 2 * lu - ly) / (ly - lu) ** 2
            + (1 / (lu + ly) + lu / (lu + ly) ** 2)
        )
        return jnp.where(i1 == 0, Vu, kyy0)


class ODE_UYC(ODE_UY):
    """ODE_UY with a constant bias on the latent-force block.

    Reference: GPy/kern/src/ODE_UYC.py (kuu += ubias)."""

    def __init__(self, input_dim=2, variance_U=3.0, variance_Y=1.0,
                 lengthscale_U=1.0, lengthscale_Y=1.0, ubias=1.0,
                 active_dims=None, name="ode_uyc"):
        super().__init__(input_dim, variance_U, variance_Y, lengthscale_U,
                         lengthscale_Y, active_dims, name)
        self._add_param("ubias", ubias, transform=Logexp())

    def K(self, X, X2=None):
        base = super().K(X, X2)
        i1 = jnp.asarray(X[:, 1], dtype=jnp.int32)
        i2 = i1 if X2 is None else jnp.asarray(X2[:, 1], dtype=jnp.int32)
        mUU = (i1 == 0)[:, None] & (i2 == 0)[None, :]
        return base + jnp.where(mUU, jnp.asarray(self.ubias), 0.0)

    def Kdiag(self, X):
        i1 = jnp.asarray(X[:, 1], dtype=jnp.int32)
        return super().Kdiag(X) + jnp.where(i1 == 0, jnp.asarray(self.ubias), 0.0)


class ODE_st(Kern):
    """Spatio-temporal transfer kernel: -a d2y/dx2 + b dy/dt + c y = U with an
    RBF prior on Y over (t, x). X = [t, x, index]; index 0 = Y rows, 1 = U rows.

    Reference: GPy/kern/src/ODE_st.py (267 LoC python slice loops -> masks)."""

    def __init__(self, input_dim=3, a=1.0, b=1.0, c=1.0, variance_Yx=3.0,
                 variance_Yt=1.5, lengthscale_Yx=1.5, lengthscale_Yt=1.5,
                 active_dims=None, name="ode_st"):
        assert input_dim == 3
        super().__init__(input_dim, active_dims, name)
        self._add_param("a", a, transform=Logexp())
        self._add_param("b", b, transform=Logexp())
        self._add_param("c", c, transform=Logexp())
        self._add_param("variance_Yt", variance_Yt, transform=Logexp())
        self._add_param("variance_Yx", variance_Yx, transform=Logexp())
        self._add_param("lengthscale_Yt", lengthscale_Yt, transform=Logexp())
        self._add_param("lengthscale_Yx", lengthscale_Yx, transform=Logexp())

    def _parts(self, X, X2):
        t1, x1 = X[:, :1], X[:, 1:2]
        i1 = jnp.asarray(X[:, 2], dtype=jnp.int32)
        if X2 is None:
            t2, x2, i2 = t1, x1, i1
        else:
            t2, x2 = X2[:, :1], X2[:, 1:2]
            i2 = jnp.asarray(X2[:, 2], dtype=jnp.int32)
        return t1, x1, i1, t2, x2, i2

    def K(self, X, X2=None):
        t1, x1, i1, t2, x2, i2 = self._parts(X, X2)
        tdist = (t1 - t2.T) ** 2
        xdist = (x1 - x2.T) ** 2
        ttdist = t1 - t2.T
        vy = jnp.asarray(self.variance_Yt) * jnp.asarray(self.variance_Yx)
        lyt = 1.0 / (2 * jnp.asarray(self.lengthscale_Yt))
        lyx = 1.0 / (2 * jnp.asarray(self.lengthscale_Yx))
        a, b, c = jnp.asarray(self.a), jnp.asarray(self.b), jnp.asarray(self.c)
        kyy = jnp.exp(-lyt * tdist - lyx * xdist)
        k1 = 2 * lyt - 4 * lyt**2 * tdist
        k2 = 4 * lyx**2 * xdist - 2 * lyx
        k3 = 12 * lyx**2 - 48 * xdist * lyx**3 + 16 * xdist**2 * lyx**4
        k4 = 2 * lyt * ttdist
        Kyy = vy * kyy
        Kyu = (-a * k2 + b * k4 + c) * vy * kyy
        Kuy = (-a * k2 - b * k4 + c) * vy * kyy
        Kuu = (b**2 * k1 - 2 * a * c * k2 + a**2 * k3 + c**2) * vy * kyy
        mY1 = (i1 == 0)[:, None]
        mY2 = (i2 == 0)[None, :]
        return jnp.where(mY1 & mY2, Kyy,
               jnp.where(mY1 & ~mY2, Kyu,
               jnp.where(~mY1 & mY2, Kuy, Kuu)))

    def Kdiag(self, X):
        return jnp.diagonal(self.K(X))


class ODE_t(Kern):
    """Temporal transfer kernel (first-order in t). X = [t, index]
    (index 0 = Y, 1 = U). Reference: GPy/kern/src/ODE_t.py."""

    def __init__(self, input_dim=2, a=1.0, c=1.0, variance_Yt=3.0,
                 lengthscale_Yt=1.5, ubias=1.0, active_dims=None, name="ode_st"):
        assert input_dim == 2
        super().__init__(input_dim, active_dims, name)
        self._add_param("a", a, transform=Logexp())
        self._add_param("c", c, transform=Logexp())
        self._add_param("variance_Yt", variance_Yt, transform=Logexp())
        self._add_param("lengthscale_Yt", lengthscale_Yt, transform=Logexp())
        self._add_param("ubias", ubias, transform=Logexp())

    def K(self, X, X2=None):
        t1 = X[:, :1]
        i1 = jnp.asarray(X[:, 1], dtype=jnp.int32)
        if X2 is None:
            t2, i2 = t1, i1
        else:
            t2 = X2[:, :1]
            i2 = jnp.asarray(X2[:, 1], dtype=jnp.int32)
        tdist = (t1 - t2.T) ** 2
        ttdist = t1 - t2.T
        vyt = jnp.asarray(self.variance_Yt)
        lyt = 1.0 / (2 * jnp.asarray(self.lengthscale_Yt))
        kyy = jnp.exp(-lyt * tdist)
        k1 = 2 * lyt - 4 * lyt**2 * tdist
        k4 = 2 * lyt * ttdist
        Kyy = vyt * kyy
        Kyu = (k4 + 1) * vyt * kyy
        Kuy = (-k4 + 1) * vyt * kyy
        Kuu = (k1 + 1.0) * vyt * kyy + jnp.asarray(self.ubias)
        mY1 = (i1 == 0)[:, None]
        mY2 = (i2 == 0)[None, :]
        return jnp.where(mY1 & mY2, Kyy,
               jnp.where(mY1 & ~mY2, Kyu,
               jnp.where(~mY1 & mY2, Kuy, Kuu)))

    def Kdiag(self, X):
        return jnp.diagonal(self.K(X))
