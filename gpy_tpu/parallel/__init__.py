"""SPMD parallelism over TPU meshes.

Replaces GPy's entire distributed stack (reference: GPy/util/parallel.py
divide_data:15-30, GPy/core/sparse_gp_mpi.py Bcast/worker-loop:82-115,
var_dtc_parallel.py Allreduce of psi statistics:121-131 and of gradient
vectors:337-424):

  MPI divide_data            -> NamedSharding(P("data")) row sharding
  MPI Bcast(param_array)     -> implicit SPMD replication of the param pytree
  MPI Allreduce(psi stats)   -> jax.lax.psum inside shard_map
  rank0/worker flag protocol -> single jitted program on all chips

`data_parallel_elbo_and_grad` is the explicit-collective path (shard_map +
psum) whose invariant — sharded == single-device values — is what GPy's
manual mpi_test__.py checked by hand; here it is an automated test.

Multi-host scaling-efficiency measurement plan (north-star: 10M rows on
v5p-16 at >80% efficiency; run when multi-chip hardware is attached):

  1. per host: `distributed_initialize()`; build
     `mesh = make_mesh_2d()` (dcn = hosts, ici = local chips) and the
     flagship `sharded_svgp_train_step(model, mesh, axis_name=("dcn","ici"))`.
  2. weak-scaling sweep: fix rows-per-chip (e.g. B=4096 local batch),
     measure steps/s at 1, 4, 8, 16 chips; efficiency_k = steps/s_k /
     (k * steps/s_1). The replicated-parameter psum is the only
     cross-chip traffic: 2 * |raw| * 4 bytes per step (~1MB at M=512),
     which ICI absorbs at <5% of a 2.6ms step; only the dcn partial
     crosses hosts.
  3. the same sweep for `sharded_iterative_nlml_grad` (within-matrix
     sharding: per-chip work O((N/k) * N), all-reduce O(N) per CG
     iteration) — the long-context analogue where communication grows
     with N, so expect the efficiency knee there first.
  4. record {chips, steps_per_s, efficiency} in BENCH extra as
     `multihost_scaling` when the driver exposes >1 real chip.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "distributed_initialize",
    "make_mesh",
    "make_mesh_2d",
    "shard_rows",
    "replicate",
    "pad_rows_to_multiple",
    "data_parallel_elbo_and_grad",
    "sharded_svgp_train_step",
    "svgp_whiten_raw",
    "svgp_unwhiten_raw",
    "sharded_gram_matvec",
    "sharded_iterative_nlml_grad",
    "sharded_vardtc_elbo_and_grad",
    "sharded_bgplvm_elbo_and_grad",
    "sharded_svi_multiout_elbo_and_grad",
    "sharded_svi_multiout_md_elbo_and_grad",
]


def distributed_initialize(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None, **kw) -> bool:
    """Multi-host entry point: call once per host process BEFORE building
    meshes, so `jax.devices()` spans every host's chips.

    Wraps `jax.distributed.initialize`; with no arguments JAX autodetects
    the TPU-pod environment (coordinator from the pod metadata). This is
    the TPU-native replacement for the reference's mpi4py bootstrap
    (GPy/core/sparse_gp_mpi.py:90-115 mpi_comm plumbing). Returns True if
    initialization happened, False if it was already done / single-host.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kw,
        )
        return True
    except (RuntimeError, ValueError):
        # already initialized, or a single-process environment without a
        # coordinator — both fine: fall through to local devices
        return False


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D device mesh over the data axis (ICI within a slice, DCN across)."""
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devs), (axis_name,))


def make_mesh_2d(n_dcn: Optional[int] = None, n_ici: Optional[int] = None,
                 axis_names=("dcn", "ici")) -> Mesh:
    """2-axis mesh: slow DCN axis (across hosts/slices) x fast ICI axis
    (within a slice). `jax.devices()` orders devices host-major, so the
    trailing mesh axis varies within a host — reductions over "ici" ride
    the intra-slice interconnect and only the "dcn" partial crosses hosts.

    Every sharded_* program here takes `axis_name`; pass the TUPLE
    `("dcn", "ici")` to shard rows over both axes (PartitionSpec and psum
    both accept axis tuples) — XLA then lowers the psum to an ICI
    all-reduce followed by a DCN all-reduce.

    Defaults: n_dcn = process count, n_ici = devices per process.
    """
    devs = jax.devices()
    if n_dcn is None:
        n_dcn = max(1, jax.process_count())
    if n_ici is None:
        n_ici = len(devs) // n_dcn
    arr = np.asarray(devs[: n_dcn * n_ici]).reshape(n_dcn, n_ici)
    return Mesh(arr, tuple(axis_names))


def shard_rows(mesh: Mesh, x, axis_name: str = "data"):
    """Place array with rows split across the mesh (GPy divide_data)."""
    return jax.device_put(x, NamedSharding(mesh, P(axis_name)))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree on every device (GPy Bcast of param_array)."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def pad_rows_to_multiple(X, Y, k: int):
    """Pad (X, Y) with zero-weight rows to a multiple of k. Returns
    (Xp, Yp, w) with w in {0,1} marking real rows."""
    n = X.shape[0]
    n_pad = (-n) % k
    w = np.ones((n + n_pad,), dtype=float)
    if n_pad:
        X = np.concatenate([X, np.zeros((n_pad, X.shape[1]), X.dtype)], 0)
        Y = np.concatenate([Y, np.zeros((n_pad, Y.shape[1]), Y.dtype)], 0)
        w[n:] = 0.0
    return X, Y, w


def data_parallel_elbo_and_grad(model, mesh: Mesh, X, Y, weights=None, axis_name: str = "data"):
    """SVGP ELBO + grads with the data term psum-reduced over the mesh.

    model: an SVGP instance. X, Y: full (padded) arrays, rows divisible by
    mesh size. weights: per-row 0/1 mask for padding.
    Returns (elbo, grad_raw_dict) — grads wrt every free raw parameter.
    """
    n_dev = mesh.devices.size
    N = X.shape[0]
    assert N % n_dev == 0, "pad rows to a multiple of the mesh size"
    if weights is None:
        weights = jnp.ones((N,), dtype=X.dtype)
    raw = model.get_raw_dict(free_only=True)
    md = model.Y_metadata

    def elbo_fn(raw_dict, Xs, Ys, ws):
        m = model.with_raw_dict(raw_dict)
        # local data term: mask padded rows via weights
        M = m.Z.shape[0]
        from ..util.choleskies import flat_to_triang
        from ..inference.svgp import q_f_marginals, kl_qu_pu

        L_u = flat_to_triang(jnp.asarray(m.q_u_chol), M)
        mu, var, Lmm, _ = q_f_marginals(m.kern, Xs, jnp.asarray(m.Z), jnp.asarray(m.q_u_mean), L_u)
        F = m.likelihood.variational_expectations(Ys, mu, var, md)
        local = jnp.sum(ws[:, None] * F)
        kl = kl_qu_pu(jnp.asarray(m.q_u_mean), L_u, Lmm)
        # replicated terms carried at 1/n_dev per device so that
        # "psum of per-device gradients" is the exact total gradient
        total = jax.lax.psum(local, axis_name)  # === the MPI Allreduce ===
        # (the backward pass of this psum IS the Allreduce of gradient
        # vectors: shard_map auto-psums cotangents of replicated params)
        return total - kl + m.log_prior()

    from jax import shard_map

    smapped = shard_map(
        jax.value_and_grad(elbo_fn),
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(), P()),
    )
    val, grads = smapped(raw, jnp.asarray(X), jnp.asarray(Y), jnp.asarray(weights))
    return val, grads


def svgp_whiten_raw(model, raw=None):
    """Convert the (q_u_mean, q_u_chol) entries of a raw dict to whitened
    coordinates at the dict's own hypers: v = Lmm^-1 m, L_w = Lmm^-1 L.
    Returns a new raw dict for use with sharded_svgp_train_step(whiten=True)."""
    from ..inference.svgp import CONST_JITTER
    from ..util.choleskies import flat_to_triang, triang_to_flat
    from ..util.linalg import chol_and_inv

    raw = dict(raw if raw is not None else model.get_raw_dict(free_only=True))
    m = model.with_raw_dict(raw)
    M = m.Z.shape[0]
    eye = jnp.eye(M, dtype=jnp.asarray(m.Z).dtype)
    Lmm, Lmi = chol_and_inv(m.kern.K(jnp.asarray(m.Z)) + CONST_JITTER * eye)
    L_u = flat_to_triang(jnp.asarray(m.q_u_chol), M)
    raw["q_u_mean"] = Lmi @ jnp.asarray(m.q_u_mean)
    raw["q_u_chol"] = triang_to_flat(jnp.einsum("ij,djk->dik", Lmi, L_u))
    return raw


def svgp_unwhiten_raw(model, raw):
    """Inverse of svgp_whiten_raw at the raw dict's (possibly updated)
    hypers: m = Lmm v, L = Lmm L_w."""
    from ..inference.svgp import CONST_JITTER
    from ..util.choleskies import flat_to_triang, triang_to_flat

    raw = dict(raw)
    m = model.with_raw_dict(raw)
    M = m.Z.shape[0]
    eye = jnp.eye(M, dtype=jnp.asarray(m.Z).dtype)
    Lmm = jnp.linalg.cholesky(m.kern.K(jnp.asarray(m.Z)) + CONST_JITTER * eye)
    L_w = flat_to_triang(jnp.asarray(m.q_u_chol), M)
    raw["q_u_mean"] = Lmm @ jnp.asarray(m.q_u_mean)
    raw["q_u_chol"] = triang_to_flat(jnp.einsum("ij,djk->dik", Lmm, L_w))
    return raw


def sharded_svgp_train_step(model, mesh: Mesh, step_size: float = 1e-2,
                            axis_name: str = "data", whiten: bool = False):
    """Build a jitted SPMD training step (Adam on all free params) for a
    data-sharded SVGP. Returns (step_fn, init_state, shard_fn).

    step_fn(params_raw, opt_state, Xs, Ys, ws) -> (params, opt_state, elbo)
    with Xs/Ys sharded over rows. This is the unit `__graft_entry__.
    dryrun_multichip` compiles over an N-device mesh.

    whiten=True interprets the raw (q_u_mean, q_u_chol) as the WHITENED
    (v, chol S_w) — convert the init state with svgp_whiten_raw and the
    trained params back with svgp_unwhiten_raw. Plain Adam on the
    unwhitened factor stalls when Kmm is ill-conditioned (see
    tests/test_svgp.py::test_fit_plain_adam_whitened_conditioning); the
    whitened coordinates remove Kmm from the variational geometry, so this
    is the recommended mode for multi-chip training.
    """
    import optax

    md = model.Y_metadata
    opt = optax.adam(step_size)

    n_dev = int(np.prod([mesh.shape[a] for a in
                         (axis_name if isinstance(axis_name, tuple)
                          else (axis_name,))]))

    def elbo_local(raw_dict, Xs, Ys, ws):
        """Per-shard ELBO contribution: local weighted datafit plus 1/k of
        the replicated (-KL + log prior) terms. psum of this value AND of
        its gradient gives the exact global ELBO/gradient — keeping the
        psum OUT of the differentiated function makes the wire payload
        exactly |raw|+1 floats (shard_map's automatic replicated-cotangent
        psums otherwise move the EXPANDED (M, M) intermediates: measured
        72,768 B vs 19,252 B of actual gradient at M=64)."""
        m = model.with_raw_dict(raw_dict)
        M = m.Z.shape[0]
        from ..util.choleskies import flat_to_triang
        from ..inference.svgp import (kl_qu_pu, kl_qu_pu_white,
                                      q_f_marginals, q_f_marginals_white)

        L_u = flat_to_triang(jnp.asarray(m.q_u_chol), M)
        if whiten:
            mu, var, _, _ = q_f_marginals_white(
                m.kern, Xs, jnp.asarray(m.Z), jnp.asarray(m.q_u_mean), L_u)
            kl = kl_qu_pu_white(jnp.asarray(m.q_u_mean), L_u)
        else:
            mu, var, Lmm, _ = q_f_marginals(
                m.kern, Xs, jnp.asarray(m.Z), jnp.asarray(m.q_u_mean), L_u)
            kl = kl_qu_pu(jnp.asarray(m.q_u_mean), L_u, Lmm)
        F = m.likelihood.variational_expectations(Ys, mu, var, md)
        local = jnp.sum(ws[:, None] * F)
        return local + (m.log_prior() - kl) / n_dev

    def inner(raw_dict, opt_state, Xs, Ys, ws):
        from jax.flatten_util import ravel_pytree

        val_l, g_l = jax.value_and_grad(elbo_local)(raw_dict, Xs, Ys, ws)
        flat_g, unravel = ravel_pytree(g_l)
        # ONE all-reduce of (|raw| grad floats, elbo scalar) — the exact
        # SPMD image of GPy's MPI Allreduce of the packed gradient vector
        # (var_dtc_parallel.py:337-424)
        flat_g, val = jax.lax.psum((flat_g, val_l), axis_name)
        g = unravel(flat_g)
        neg = jax.tree_util.tree_map(lambda x: -x, g)
        updates, opt_state = opt.update(neg, opt_state, raw_dict)
        import optax as _ox

        raw_dict = _ox.apply_updates(raw_dict, updates)
        return raw_dict, opt_state, val

    from jax import shard_map

    # check_vma=False: with VMA checking on, shard_map's transpose inserts
    # automatic psums for every replicated-input cotangent at its USE site —
    # the wire then carries the EXPANDED (M, M) intermediates (measured
    # 72,768 B vs the 19,252 B of actual gradient at M=64) and the explicit
    # packed psum in `inner` would double-count. With it off, `inner`'s one
    # psum of (flat grad, elbo) is the entire per-step collective payload:
    # exactly (|raw| + 1) floats, asserted by benchmarks/multihost_scaling.py.
    step = shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    step = jax.jit(step)
    raw0 = model.get_raw_dict(free_only=True)
    if whiten:
        # hand back whitened init coords so step_fn's interpretation and the
        # returned state agree; convert back with svgp_unwhiten_raw after
        raw0 = svgp_whiten_raw(model, raw0)
    state0 = opt.init(raw0)
    return step, (raw0, state0), partial(shard_rows, mesh, axis_name=axis_name)


def sharded_gram_matvec(mesh: Mesh, kern, X, V, noise=None, block=2048,
                        axis_name: str = "data", fused=False,
                        fused_accum="f32x3"):
    """(K(X,X) + diag(noise)) @ V with rows of K sharded over the mesh.

    The within-matrix sharding of SURVEY.md §5: each device streams its row
    slab of the Gram against the (replicated, small) full X — the same
    blockwise-pairwise tiling as the single-device ops/gram_matvec.py, so no
    device ever holds more than O(block * N). The output rows come back
    sharded; collectives only move the (N, R) vectors, never K.

    X must have rows divisible by the mesh size (see pad_rows_to_multiple).
    """
    n_dev = mesh.devices.size
    N = X.shape[0]
    assert N % n_dev == 0, f"N={N} not divisible by mesh size {n_dev}"
    V2 = V if V.ndim == 2 else V[:, None]
    noise_v = jnp.zeros(N, X.dtype) if noise is None else noise
    # kernel parameters flow in as explicit replicated arguments: closure
    # captures of traced values carry the caller's (Auto-mesh) sharding and
    # clash with the Manual shard_map context (observed when optimizer
    # outputs, sharded by a previous jitted step, are fed back in)
    kraw = kern.get_raw_dict()

    from ..ops.pallas_gram_matvec import fused_available, kern_gram_matvec_fused

    use_fused = fused and fused_available(kern)

    def local(mv_X_loc, X_full, V_full, noise_loc, V_loc, kraw_in):
        k2 = kern.with_raw_dict(kraw_in)
        if use_fused:
            # per-device rectangular slab through the Pallas fused kernel
            out = kern_gram_matvec_fused(k2, mv_X_loc, V_full, X2=X_full,
                                         accum=fused_accum)
        else:
            out = gram_matvec_rows(k2, mv_X_loc, X_full, V_full, block)
        return out + noise_loc[:, None] * V_loc

    def gram_matvec_rows(k2, X_rows, X_full, V_full, block):
        # row-slab streamed product (same remat structure as gram_matvec)
        n_loc = X_rows.shape[0]
        n_pad = (-n_loc) % block
        Xp = jnp.concatenate([X_rows, jnp.zeros((n_pad, X_rows.shape[1]), X_rows.dtype)], 0) if n_pad else X_rows
        Xb = Xp.reshape(-1, block, X_rows.shape[1])

        @jax.checkpoint
        def one(xb):
            return k2.K(xb, X_full) @ V_full

        out = jax.lax.map(one, Xb).reshape(-1, V_full.shape[1])
        return out[:n_loc]

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name), P(), P(), P(axis_name), P(axis_name), P()),
        out_specs=P(axis_name),
        check_vma=False,
    )
    out = fn(X, X, V2, noise_v, V2, kraw)
    return out if V.ndim == 2 else out[:, 0]


def sharded_iterative_nlml_grad(mesh: Mesh, model, max_cg=48, n_probes=8,
                                block=2048, seed=0, axis_name: str = "data",
                                fused=False, fused_accum="f32x3"):
    """NLML + gradient of an exact GP with the Gram rows sharded over the
    mesh — multi-chip matrix-free exact inference (iterative.py recipe with
    sharded_gram_matvec as the engine).

    Returns (value, grad_flat) as a jitted callable of the model's flat raw
    vector. Rows of X/Y must divide the mesh size.
    """
    from ..inference.iterative import cg_batched, _slq_logdet

    X = jnp.asarray(model.X)
    Y = jnp.asarray(model.Y_normalized)
    N, D = Y.shape
    LOG_2_PI = float(np.log(2 * np.pi))

    def nlml(flat):
        m = model.with_flat_raw(flat)
        kern, lik = m.kern, m.likelihood
        noise = lik.noise_diagonal(N, m.Y_metadata) + 1e-6
        Z = jax.random.rademacher(jax.random.PRNGKey(seed), (N, n_probes), dtype=X.dtype)

        k_sg = kern.stop_gradient()

        def mv_sg(V):
            # fused only applies here: the KU surrogate below needs the
            # differentiable blockwise path (the Pallas kernel has no VJP)
            return sharded_gram_matvec(mesh, k_sg, X, V,
                                       noise=jax.lax.stop_gradient(noise),
                                       block=block, axis_name=axis_name,
                                       fused=fused, fused_accum=fused_accum)

        RHS = jnp.concatenate([Y, Z], axis=1)
        sol, alphas, betas, _ = cg_batched(mv_sg, RHS, maxiter=max_cg)
        sol = jax.lax.stop_gradient(sol)
        alpha, Wp = sol[:, :D], sol[:, D:]
        logdet = _slq_logdet(jax.lax.stop_gradient(alphas[:, D:]),
                             jax.lax.stop_gradient(betas[:, D:]),
                             jnp.sum(Z * Z, axis=0), N, n_probes)
        quad_y = jnp.sum(Y * alpha)
        value = -0.5 * (quad_y + D * logdet + D * N * LOG_2_PI)
        KU = sharded_gram_matvec(mesh, kern, X,
                                 jnp.concatenate([alpha, Wp], axis=1),
                                 noise=noise, block=block, axis_name=axis_name)
        surrogate = (0.5 * jnp.sum(alpha * KU[:, :D])
                     - 0.5 * (D / n_probes) * jnp.sum(Z * KU[:, D:]))
        L = jax.lax.stop_gradient(value - jax.lax.stop_gradient(surrogate)) + surrogate
        return -(L + m.log_prior())

    return jax.jit(jax.value_and_grad(nlml))


def sharded_vardtc_elbo_and_grad(model, mesh: Mesh, X=None, Y=None, weights=None,
                             axis_name: str = "data"):
    """Collapsed VarDTC bound + gradients with row-sharded psi statistics.

    The TPU replacement of the reference's distributed sparse-GP path
    (GPy var_dtc_parallel.py gatherPsiStat:72-133 — MPI Allreduce of
    {psi0, psi1Y, psi2, YRY} — and update_gradients:337-424 — Allreduce of
    the gradient vector; driven by core/sparse_gp_mpi.py). Here the local
    per-shard statistics are `psum`'d over the mesh, the M x M algebra runs
    replicated on every device, and the backward pass of those psums IS the
    gradient Allreduce (shard_map auto-reduces cotangents of replicated
    parameters).

    model: a SparseGP with Gaussian likelihood (SparseGPRegression).
    X, Y: full arrays with rows divisible by the mesh size (see
    pad_rows_to_multiple); default the model's own data. weights: 0/1 row
    mask for padding. Returns (log_marginal, grad_raw_dict); the value
    equals the serial VarDTC inference exactly.
    """
    import jax.scipy.linalg as jsl
    from jax import shard_map

    if X is None:
        X, Y, weights = pad_rows_to_multiple(
            np.asarray(model.X), np.asarray(model.Y_normalized), mesh.devices.size)
    n_dev = mesh.devices.size
    N = X.shape[0]
    assert N % n_dev == 0, "pad rows to a multiple of the mesh size"
    if weights is None:
        weights = jnp.ones((N,), dtype=jnp.asarray(X).dtype)
    raw = model.get_raw_dict(free_only=True)
    D = Y.shape[1]
    LOG_2_PI = float(np.log(2.0 * np.pi))
    CONST_JITTER = 1e-6

    def nlml_fn(raw_dict, Xs, Ys, ws):
        m = model.with_raw_dict(raw_dict)
        Z = jnp.asarray(m.Z)
        M = Z.shape[0]
        Wn = ws / jnp.asarray(m.likelihood.variance)  # masked per-row precision
        # --- local psi statistics (this shard's rows) --------------------
        Kmn = m.kern.K(Z, Xs)                      # (M, n_loc)
        Psi2W_loc = (Kmn * Wn[None, :]) @ Kmn.T    # sum_n W_n k_n k_n'
        psi1WY_loc = Kmn @ (Wn[:, None] * Ys)      # (M, D)
        psi0_loc = jnp.sum(Wn * m.kern.Kdiag(Xs))
        YWY_loc = jnp.sum(Wn[:, None] * Ys * Ys)
        logW_loc = jnp.sum(ws * jnp.log(jnp.maximum(Wn, 1e-300)) * jnp.where(ws > 0, 1.0, 0.0))
        N_loc = jnp.sum(ws)
        # --- the Allreduce (gatherPsiStat) --------------------------------
        Psi2W = jax.lax.psum(Psi2W_loc, axis_name)
        psi1WY = jax.lax.psum(psi1WY_loc, axis_name)
        psi0_sum = jax.lax.psum(psi0_loc, axis_name)
        YWY = jax.lax.psum(YWY_loc, axis_name)
        logW = jax.lax.psum(logW_loc, axis_name)
        N_eff = jax.lax.psum(N_loc, axis_name)
        # --- replicated M x M algebra (identical on every device) ---------
        Kmm = m.kern.K(Z) + CONST_JITTER * jnp.eye(M, dtype=Z.dtype)
        L = jnp.linalg.cholesky(Kmm)
        tmp = jsl.solve_triangular(L, Psi2W, lower=True)
        AAT = jsl.solve_triangular(L, tmp.T, lower=True).T
        AAT = 0.5 * (AAT + AAT.T)
        LB = jnp.linalg.cholesky(jnp.eye(M, dtype=Z.dtype) + AAT)
        c = jsl.solve_triangular(LB, jsl.solve_triangular(L, psi1WY, lower=True), lower=True)
        log_marginal = (
            -0.5 * N_eff * D * LOG_2_PI
            + 0.5 * D * logW
            - D * jnp.sum(jnp.log(jnp.diagonal(LB)))
            - 0.5 * YWY
            + 0.5 * jnp.sum(c * c)
            - 0.5 * D * (psi0_sum - jnp.trace(AAT))
        )
        return log_marginal + m.log_prior()

    smapped = shard_map(
        jax.value_and_grad(nlml_fn),
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(), P()),
    )
    val, grads = jax.jit(smapped)(raw, jnp.asarray(X), jnp.asarray(Y), jnp.asarray(weights))
    return val, grads


def sharded_bgplvm_elbo_and_grad(model, mesh: Mesh, axis_name: str = "data"):
    """Bayesian-GPLVM ELBO + gradients with the variational latent rows
    sharded over the mesh — the reference's flagship distributed workload
    (GPy BayesianGPLVM(mpi_comm=...) -> core/sparse_gp_mpi.py + the
    var_dtc_parallel.py psi-stat Allreduce).

    The q(X) means/variances are row-indexed PARAMETERS: their shards stay
    resident per device (gradient shards come back per device row block),
    while kernel/Z/noise parameters are replicated and their gradients are
    Allreduce'd by shard_map's cotangent psum. Returns
    (elbo, grads) with grads a dict over the model's free raw parameters
    (qX.* entries are full (N, Q) arrays reassembled from the shards).
    """
    import jax.scipy.linalg as jsl
    from jax import shard_map

    n_dev = mesh.devices.size
    raw = model.get_raw_dict(free_only=True)
    sharded_keys = {k for k in raw if k.startswith("qX.")}
    N = int(np.asarray(raw["qX.mean"]).shape[0])
    n_pad = (-N) % n_dev
    D = model.Y_normalized.shape[1]
    LOG_2_PI = float(np.log(2.0 * np.pi))
    CONST_JITTER = 1e-6

    Y = np.asarray(model.Y_normalized)
    w = np.ones(N + n_pad, dtype=Y.dtype)
    if n_pad:
        Y = np.concatenate([Y, np.zeros((n_pad, D), Y.dtype)], 0)
        w[N:] = 0.0
        raw = dict(raw)
        for k in sharded_keys:
            a = np.asarray(raw[k])
            raw[k] = np.concatenate([a, np.zeros((n_pad, a.shape[1]), a.dtype)], 0)

    from ..core.variational import NormalPosterior
    from ..core.transformations import Logexp

    def elbo_fn(raw_dict, Ys, ws):
        # subset update: replicated params only (qX rows are used locally)
        m = model.with_raw_dict({k: v for k, v in raw_dict.items() if k not in sharded_keys})
        # local q(X) rows from the sharded raw leaves
        mu_loc = raw_dict["qX.mean"]
        S_loc = Logexp().forward(raw_dict["qX.variance"])
        Z = jnp.asarray(m.Z)
        M = Z.shape[0]

        class _QX:  # duck-typed NormalPosterior view of the local shard
            mean = mu_loc
            variance = S_loc

        Wn = ws / jnp.asarray(m.likelihood.variance)
        psi1 = m.kern.psi1(Z, _QX)                      # (n_loc, M)
        psi2n = m.kern.psi2n(Z, _QX)                    # (n_loc, M, M)
        Psi2W_loc = jnp.einsum("n,nmk->mk", Wn, psi2n)
        psi1WY_loc = psi1.T @ (Wn[:, None] * Ys)
        psi0_loc = jnp.sum(Wn * m.kern.psi0(Z, _QX))
        YWY_loc = jnp.sum(Wn[:, None] * Ys * Ys)
        logW_loc = jnp.sum(ws * jnp.log(jnp.maximum(Wn, 1e-300)))
        N_loc = jnp.sum(ws)
        kl_loc = 0.5 * jnp.sum(ws[:, None] * (mu_loc**2 + S_loc - jnp.log(S_loc) - 1.0))
        # === the MPI Allreduce of {psi0, psi1Y, psi2, YRY} ===
        Psi2W = jax.lax.psum(Psi2W_loc, axis_name)
        psi1WY = jax.lax.psum(psi1WY_loc, axis_name)
        psi0_sum = jax.lax.psum(psi0_loc, axis_name)
        YWY = jax.lax.psum(YWY_loc, axis_name)
        logW = jax.lax.psum(logW_loc, axis_name)
        N_eff = jax.lax.psum(N_loc, axis_name)
        kl = jax.lax.psum(kl_loc, axis_name)
        # replicated M x M algebra
        Kmm = m.kern.K(Z) + CONST_JITTER * jnp.eye(M, dtype=Z.dtype)
        L = jnp.linalg.cholesky(Kmm)
        tmp = jsl.solve_triangular(L, Psi2W, lower=True)
        AAT = jsl.solve_triangular(L, tmp.T, lower=True).T
        AAT = 0.5 * (AAT + AAT.T)
        LB = jnp.linalg.cholesky(jnp.eye(M, dtype=Z.dtype) + AAT)
        c = jsl.solve_triangular(LB, jsl.solve_triangular(L, psi1WY, lower=True), lower=True)
        bound = (
            -0.5 * N_eff * D * LOG_2_PI
            + 0.5 * D * logW
            - D * jnp.sum(jnp.log(jnp.diagonal(LB)))
            - 0.5 * YWY
            + 0.5 * jnp.sum(c * c)
            - 0.5 * D * (psi0_sum - jnp.trace(AAT))
        )
        return bound - kl + m.log_prior()

    specs = {k: (P(axis_name) if k in sharded_keys else P()) for k in raw}
    smapped = shard_map(
        jax.value_and_grad(elbo_fn),
        mesh=mesh,
        in_specs=(specs, P(axis_name), P(axis_name)),
        out_specs=(P(), specs),
    )
    val, grads = jax.jit(smapped)(
        {k: jnp.asarray(v) for k, v in raw.items()}, jnp.asarray(Y), jnp.asarray(w))
    if n_pad:
        grads = dict(grads)
        for k in sharded_keys:
            grads[k] = grads[k][:N]
    return val, grads


def sharded_svi_multiout_elbo_and_grad(model, mesh: Mesh, axis_name="data"):
    """LVMOGP (Kronecker-factored SVI multiout) ELBO + gradients with the
    (Xc, Y) data rows sharded over the mesh.

    Both LVMOGP bounds are row-sums over the data axis plus replicated
    M-space algebra — exactly the gatherPsiStat pattern of the reference's
    distributed VarDTC (GPy var_dtc_parallel.py:72-133, Allreduce of psi
    statistics): the per-shard row stats from
    inference.svi_multiout._full_row_stats are psum'd, then the SAME
    replicated combine (_elbo_from_stats) the serial bound uses runs on
    every device — serial/sharded parity holds by construction. The
    backward pass of the psums is the gradient Allreduce (shard_map
    auto-reduces cotangents of replicated parameters).

    model: a GPMultioutRegression. Returns (elbo, grad_raw_dict); the value
    equals model.log_likelihood() + model.log_prior() exactly.
    """
    from jax import shard_map
    from ..inference.svi_multiout import (_common, _elbo_from_stats,
                                          _full_row_stats)

    n_dev = mesh.devices.size
    X, Y, w = pad_rows_to_multiple(np.asarray(model.X), np.asarray(model.Y),
                                   n_dev)
    raw = model.get_raw_dict(free_only=True)
    D = Y.shape[1]

    def elbo_fn(raw_dict, Xs, Ys, ws):
        m = model.with_raw_dict(raw_dict)
        Sr, Sc = m._qU_cov()
        Zr, Zc = jnp.asarray(m.Z_row), jnp.asarray(m.Z)
        s2 = m.likelihood.gaussian_variance(None)
        cm = _common(m.kern_row, m.kern, m.X_row, Zr, Zc,
                     jnp.asarray(m.qU_mean), Sr, Sc)
        stats = _full_row_stats(cm, m.kern, Xs, Zc, Ys, weights=ws)
        # === the Allreduce (gatherPsiStat) of the row-sum statistics ===
        stats = jax.lax.psum(stats, axis_name)
        elbo = _elbo_from_stats(cm, Zc.shape[0], Zr.shape[0], D, 1.0 / s2,
                                *stats)
        return elbo - m.X_row.KL() + m.log_prior()

    smapped = shard_map(
        jax.value_and_grad(elbo_fn),
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(), P()),
    )
    val, grads = jax.jit(smapped)(
        {k: jnp.asarray(v) for k, v in raw.items()},
        jnp.asarray(X), jnp.asarray(Y), jnp.asarray(w))
    return val, grads


def sharded_svi_multiout_md_elbo_and_grad(model, mesh: Mesh, axis_name="data"):
    """Missing-data LVMOGP bound + gradients with the stacked (X, Y, indexD)
    rows sharded over the mesh (see sharded_svi_multiout_elbo_and_grad; the
    per-output one-hot stats of _md_row_stats are psum'd the same way).

    model: a GPMultioutRegressionMD (incl. heteroscedastic noise — beta is
    replicated (D,) algebra). Returns (elbo, grad_raw_dict) equal to the
    serial objective exactly.
    """
    from jax import shard_map
    from ..inference.svi_multiout import (_common, _md_elbo_from_stats,
                                          _md_row_stats)

    n_dev = mesh.devices.size
    X = np.asarray(model.X)
    Y = np.asarray(model.Y).reshape(-1, 1)
    idx = np.asarray(model.indexD).reshape(-1)
    X, Y, w = pad_rows_to_multiple(X, Y, n_dev)
    if idx.shape[0] < X.shape[0]:
        idx = np.concatenate([idx, np.zeros(X.shape[0] - idx.shape[0], idx.dtype)])
    raw = model.get_raw_dict(free_only=True)
    D = int(model.output_dim)

    def elbo_fn(raw_dict, Xs, Ys, ids, ws):
        m = model.with_raw_dict(raw_dict)
        Sr, Sc = m._qU_cov()
        Zr, Zc = jnp.asarray(m.Z_row), jnp.asarray(m.Z)
        s2 = m.likelihood.gaussian_variance(None)
        beta = jnp.broadcast_to(1.0 / jnp.atleast_1d(jnp.asarray(s2)), (D,))
        cm = _common(m.kern_row, m.kern, m.X_row, Zr, Zc,
                     jnp.asarray(m.qU_mean), Sr, Sc)
        stats = _md_row_stats(cm, m.kern, Xs, Zc, Ys, ids, D, weights=ws)
        stats = jax.lax.psum(stats, axis_name)
        elbo = _md_elbo_from_stats(cm, Zc.shape[0], Zr.shape[0], beta, *stats)
        return elbo - m.X_row.KL() + m.log_prior()

    smapped = shard_map(
        jax.value_and_grad(elbo_fn),
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(), P()),
    )
    val, grads = jax.jit(smapped)(
        {k: jnp.asarray(v) for k, v in raw.items()},
        jnp.asarray(X), jnp.asarray(Y), jnp.asarray(idx), jnp.asarray(w))
    return val, grads
