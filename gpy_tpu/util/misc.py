"""Small math/util helpers.

Reference: GPy/util/univariate_Gaussian.py (std_norm_pdf/cdf, logPhi,
derivLogCdfNormal), GPy/util/squashers.py (sigmoid, single_softmax),
GPy/util/functions.py (normcdf, clip_exp...), GPy/util/diag.py (view/add),
GPy/util/block_matrices.py, GPy/util/classification.py (conf_matrix),
GPy/util/subarray_and_sorting.py (common_subarrays).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import log_ndtr, ndtr
from jax.scipy.stats import norm

__all__ = [
    "std_norm_pdf", "std_norm_cdf", "logPhi", "derivLogCdfNormal", "cdfNormal",
    "sigmoid", "single_softmax", "clip_exp", "normcdf",
    "diag_view", "diag_add",
    "block", "unblock", "block_dot",
    "conf_matrix",
    "logPdfNormal", "logCdfNormal", "inv_std_norm_cdf",
    "common_subarrays",
]


# --- univariate Gaussian (GPy: util/univariate_Gaussian.py) ---------------
def std_norm_pdf(x):
    return norm.pdf(x)


def std_norm_cdf(x):
    return ndtr(x)


cdfNormal = std_norm_cdf


def logPhi(x):
    return log_ndtr(x)


# reference-name aliases (GPy util/univariate_Gaussian.py:26/54/14)
def logPdfNormal(z):
    return norm.logpdf(z)


logCdfNormal = logPhi


def inv_std_norm_cdf(x):
    """Quantile of the standard normal (GPy: util/univariate_Gaussian.py:14)."""
    from jax.scipy.special import ndtri

    return ndtri(x)


def derivLogCdfNormal(x):
    """phi(x)/Phi(x), stable in the tail."""
    return jnp.exp(norm.logpdf(x) - log_ndtr(x))


# --- squashers (GPy: util/squashers.py) -----------------------------------
def sigmoid(x):
    return jax.nn.sigmoid(x)


def single_softmax(x):
    return jax.nn.softmax(x, axis=-1)


def clip_exp(x, lower=-250.0, upper=250.0):
    return jnp.exp(jnp.clip(x, lower, upper))


normcdf = std_norm_cdf


# --- diag ops (GPy: util/diag.py) ------------------------------------------
def diag_view(A):
    return jnp.diagonal(A)


def diag_add(A, d):
    from .linalg import diag_add as _da

    return _da(A, d)


# --- block matrices (GPy: util/block_matrices.py) --------------------------
def block(blocks):
    """2-D list of blocks -> dense matrix (np.block)."""
    return jnp.block(blocks)


def unblock(A, row_sizes, col_sizes):
    out = []
    r0 = 0
    for r in row_sizes:
        row = []
        c0 = 0
        for c in col_sizes:
            row.append(A[r0 : r0 + r, c0 : c0 + c])
            c0 += c
        out.append(row)
        r0 += r
    return out


def block_dot(A_blocks, B_blocks):
    n = len(A_blocks)
    m = len(B_blocks[0])
    k = len(B_blocks)
    return [
        [sum(A_blocks[i][l] @ B_blocks[l][j] for l in range(k)) for j in range(m)]
        for i in range(n)
    ]


# --- classification metrics (GPy: util/classification.py) ------------------
def conf_matrix(p, labels, names=("+1", "-1"), threshold=0.5, show=False):
    """Binary confusion matrix from probabilities. Returns (matrix, accuracy)."""
    p = np.asarray(p).reshape(-1)
    y = np.asarray(labels).reshape(-1)
    pred = (p > threshold).astype(int)
    tp = int(np.sum((pred == 1) & (y == 1)))
    tn = int(np.sum((pred == 0) & (y == 0)))
    fp = int(np.sum((pred == 1) & (y == 0)))
    fn = int(np.sum((pred == 0) & (y == 1)))
    M = np.array([[tp, fn], [fp, tn]])
    acc = (tp + tn) / max(len(y), 1)
    if show:
        print(f"conf matrix {names}:\n{M}\naccuracy: {acc:.3f}")
    return M, acc


# --- subarrays (GPy: util/subarray_and_sorting.py) --------------------------
def common_subarrays(X, axis=0):
    """Map from unique rows (as tuples) to the index list where they occur."""
    X = np.asarray(X)
    if axis == 1:
        X = X.T
    out = {}
    for i, row in enumerate(X):
        out.setdefault(tuple(row.tolist()), []).append(i)
    return out


# --- GPy util/misc.py parity helpers (misc.py:16-122) ------------------------

def safe_exp(f):
    """exp with clipping to avoid overflow (GPy misc.py:16)."""
    return jnp.exp(jnp.clip(f, -np.inf, np.log(np.finfo(np.float64).max) - 1.0))


def safe_square(f):
    clip = np.sqrt(np.finfo(np.float64).max) / 2.0
    return jnp.square(jnp.clip(f, -clip, clip))


def safe_cube(f):
    clip = np.cbrt(np.finfo(np.float64).max) / 2.0
    return jnp.clip(f, -clip, clip) ** 3


def safe_quad(f):
    clip = np.finfo(np.float64).max ** 0.25 / 2.0
    return jnp.clip(f, -clip, clip) ** 4


def safe_three_times(f):
    return 3.0 * jnp.clip(f, -np.finfo(np.float64).max / 4.0, np.finfo(np.float64).max / 4.0)


def chain_1(df_dg, dg_dx):
    """d/dx f(g(x)) (GPy misc.py:36 — kept for API parity; autodiff makes
    these unnecessary internally)."""
    return df_dg * dg_dx


def chain_2(d2f_dg2, dg_dx, df_dg, d2g_dx2):
    """d2/dx2 f(g(x))."""
    return d2f_dg2 * (dg_dx**2) + df_dg * d2g_dx2


def chain_3(d3f_dg3, dg_dx, d2f_dg2, d2g_dx2, df_dg, d3g_dx3):
    """d3/dx3 f(g(x))."""
    return d3f_dg3 * (dg_dx**3) + 3.0 * d2f_dg2 * dg_dx * d2g_dx2 + df_dg * d3g_dx3


def linear_grid(D, n=100, min_max=(-100, 100)):
    """n linearly spaced points replicated over D columns (GPy misc.py:81)."""
    g = np.linspace(min_max[0], min_max[1], n)
    return np.ones((n, D)) * g[:, None]


def kmm_init(X, m=10, seed=None):
    """kmeans++-style inducing-point initialization (GPy misc.py:96):
    iteratively draw points with probability proportional to squared
    distance from the last chosen point."""
    if m < 1:
        raise ValueError(f"kmm_init needs m >= 1, got {m}")
    X = np.asarray(X)
    rng = np.random.default_rng(seed)
    sq = np.sum(X * X, axis=1)
    D = np.maximum(sq[:, None] + sq[None, :] - 2.0 * (X @ X.T), 0.0)
    s = int(rng.permutation(X.shape[0])[0])
    chosen = [s]
    prob = D[s] / D[s].sum()
    for _ in range(m - 1):
        s = int(rng.choice(X.shape[0], p=prob))
        chosen.append(s)
        prob = D[s] / D[s].sum()
    return X[np.array(chosen)]


def param_to_array(*param):
    """GPy misc.py:125 converted ObsAr params to ndarrays; here parameters
    are already array leaves, so this is a thin np.asarray map."""
    arrays = [np.asarray(p) for p in param]
    return arrays[0] if len(arrays) == 1 else arrays


def opt_wrapper(m, **kwargs):
    """Optimize a model and return it (GPy misc.py:72, used for
    multiprocessing maps)."""
    m.optimize(**kwargs)
    return m
