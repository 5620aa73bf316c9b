"""Multi-output model builders.

Reference: GPy/util/multioutput.py (index_to_slices:6, build_XY:48,
build_likelihood:70, ICM:86, LCM:118, Private:138).
"""
from __future__ import annotations

import numpy as np

from ..kern import Coregionalize
from ..likelihoods import Gaussian, MixedNoise

__all__ = ["build_XY", "build_likelihood", "ICM", "LCM", "Private", "index_to_slices"]


def index_to_slices(index):
    """GPy: util/multioutput.py:6 — contiguous slices per index value."""
    index = np.asarray(index).astype(int).reshape(-1)
    if index.size == 0:
        return []
    out = [[] for _ in range(index.max() + 1)]
    start = 0
    for i in range(1, index.size + 1):
        if i == index.size or index[i] != index[start]:
            out[index[start]].append(slice(start, i))
            start = i
    return out


def build_XY(input_list, output_list=None, index=None):
    """Stack per-output (X_i, Y_i) and append the output-index column.

    GPy: util/multioutput.py:48. Returns (X, Y, output_index)."""
    num_outputs = len(input_list)
    if output_list is not None:
        assert len(output_list) == num_outputs
        Y = np.vstack(output_list)
    else:
        Y = None
    if index is not None:
        assert len(index) == num_outputs
        I = np.hstack([np.repeat(j, _x.shape[0]) for _x, j in zip(input_list, index)])
    else:
        I = np.hstack([np.repeat(j, _x.shape[0]) for _x, j in zip(input_list, range(num_outputs))])
    X = np.vstack(input_list)
    X = np.hstack([X, I[:, None]])
    return X, Y, I[:, None]


def build_likelihood(Y_list, noise_index, likelihoods_list=None):
    """GPy: util/multioutput.py:70 — MixedNoise over per-output Gaussians."""
    Ny = len(Y_list)
    if likelihoods_list is None:
        likelihoods_list = [Gaussian(name=f"Gaussian_noise_{j}") for j in range(Ny)]
    else:
        assert len(likelihoods_list) == Ny
    return MixedNoise(likelihoods_list)


def ICM(input_dim, num_outputs, kernel, W_rank=1, W=None, kappa=None, name="ICM"):
    """Intrinsic coregionalization: B ⊗ K. GPy: util/multioutput.py:86."""
    if kernel.input_dim != input_dim:
        kernel.input_dim = input_dim
        raise ValueError("kernel.input_dim does not match input_dim")
    B = Coregionalize(
        1, output_dim=num_outputs, rank=W_rank, W=W, kappa=kappa,
        active_dims=[input_dim], name="B",
    )
    K = kernel * B
    K.name = name
    return K


def LCM(input_dim, num_outputs, kernels_list, W_rank=1, name="ICM"):
    """Linear coregionalization: sum of ICMs. GPy: util/multioutput.py:118."""
    Nk = len(kernels_list)
    K = ICM(input_dim, num_outputs, kernels_list[0], W_rank, name=f"{name}0")
    for j, kernel in enumerate(kernels_list[1:]):
        K = K + ICM(input_dim, num_outputs, kernel, W_rank, name=f"{name}{j+1}")
    return K


def Private(input_dim, num_outputs, kernel, output, kappa=None, name="X"):
    """ICM with variance only on one output. GPy: util/multioutput.py:138."""
    K = ICM(input_dim, num_outputs, kernel, W_rank=1, kappa=kappa, name=name)
    # pick the Coregionalize part
    coreg = K.parts[1]
    coreg.W.fix(np.zeros_like(np.asarray(coreg.W)))
    kap = np.zeros(num_outputs)
    kap[output] = 1e-2
    coreg.kappa = kap
    return K
