"""State-space (Kalman) GPs for 1-D inputs: O(N) exact inference.

Reference: GPy/models/state_space.py:27 (745), state_space_model.py (471),
state_space_main.py (4369 — hand-written Kalman/RTS/EM with SVD
stabilization and Cython inner loops state_space_cython.pyx).

TPU design: the entire subsystem collapses to two `lax.scan`s (filter +
RTS smoother) over jittable per-step linear algebra on tiny (s x s) state
matrices, with hyperparameter gradients by autodiff through the scan —
replacing ~5k lines of hand-written derivative recursions. Discretization
A = expm(F dt) uses jax.scipy.linalg.expm (differentiable); process noise
Q is Pinf - A Pinf A' for stationary blocks (exact for LTI SDEs started
from stationarity) and the Van Loan matrix-exponential integral for
nonstationary blocks (Linear, Brownian). Kernels supply (F, L, Qc, H,
Pinf[, P0]) via .sde() (Exponential/OU, Matern32/52, RBF, StdPeriodic,
Bias, Linear, Brownian; sums stack block-diagonally, White summands fold
exactly into the observation noise).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..core.model import Model
from ..core.transformations import Logexp
from ..config import default_dtype
from ..util.linalg import solve_lu_safe
from ..kern import Add, Kern, Matern32, White

__all__ = ["StateSpace", "combined_sde", "sde_parts"]

LOG_2_PI = float(np.log(2 * np.pi))


def sde_parts(kern: Kern, t0=0.0):
    """Flatten a (possibly summed) kernel into SDE blocks.

    Returns ``(parts, white_var)`` where each part is a tuple
    ``(F, L, Qc, H, Pinf, P0, stationary)``. Kernels whose ``sde()`` returns
    the 5-tuple (F, L, Qc, H, Pinf) are stationary (P0 = Pinf, exact
    discretization Q = Pinf - A Pinf A'); a 6-tuple with a distinct P0 marks
    a nonstationary prior (Linear/Brownian), discretized by Van Loan.
    White-kernel summands have no state: their variance is exactly
    absorbed into the observation noise (the reference instead uses an
    F = -inf placeholder state, GPy sde_static.py:35-58).

    GPy: sum handling mirrors GPy/models/state_space_model.py (block-diag
    stacking of the per-part state spaces).
    """
    if isinstance(kern, Add):
        parts, white = [], 0.0
        for p in kern.parts:
            ps, w = sde_parts(p, t0)
            parts.extend(ps)
            white = white + w
        return parts, white
    if isinstance(kern, White):
        return [], jnp.asarray(kern.variance)
    try:
        tup = kern.sde(t0=t0)
    except TypeError:
        tup = kern.sde()
    if len(tup) == 5:
        F, L, Qc, H, Pinf = tup
        return [(F, L, Qc, H, Pinf, Pinf, True)], 0.0
    F, L, Qc, H, Pinf, P0 = tup
    return [(F, L, Qc, H, Pinf, P0, False)], 0.0


def combined_sde(kern: Kern, t0=0.0):
    """(F, L, Qc, H, Pinf, P0) for a kernel; sums stack block-diagonally.

    White summands are excluded (they carry observation noise, no state —
    see `sde_parts`). GPy: sde kernels return analogous tuples
    (e.g. stationary.py:520-554)."""
    parts, _ = sde_parts(kern, t0)
    if not parts:
        raise ValueError("kernel has no SDE state (White-only kernel?)")
    F = jax.scipy.linalg.block_diag(*[p[0] for p in parts])
    L = jax.scipy.linalg.block_diag(*[p[1] for p in parts])
    Qc = jax.scipy.linalg.block_diag(*[p[2] for p in parts])
    H = jnp.concatenate([p[3] for p in parts], axis=1)
    Pinf = jax.scipy.linalg.block_diag(*[p[4] for p in parts])
    P0 = jax.scipy.linalg.block_diag(*[p[5] for p in parts])
    return F, L, Qc, H, Pinf, P0


def _van_loan(F, LQcLt, dt):
    """A = expm(F dt) and Q = int_0^dt e^{Fs} L Qc L' e^{F's} ds via the
    Van Loan (1978) block-matrix exponential — exact for any LTI SDE,
    stationary or not."""
    s = F.shape[0]
    M = (
        jnp.zeros((2 * s, 2 * s), dtype=F.dtype)
        .at[:s, :s].set(-F)
        .at[:s, s:].set(LQcLt)
        .at[s:, s:].set(F.T)
    )
    from ..util.linalg import expm_safe
    Phi = expm_safe(M * dt)
    A = Phi[s:, s:].T
    Q = A @ Phi[:s, s:]
    return A, 0.5 * (Q + Q.T)


class StateSpace(Model):
    """Kalman-filter GP regression on sorted 1-D inputs.

    NLML equals the dense GP's (test oracle: GPy's
    state_space_main_tests.py compares Kalman vs dense results).
    """

    def __init__(self, X, Y, kernel=None, noise_var=1.0, parallel=False,
                 engine="scan", stable=False, parallel_chunks=None,
                 name="StateSpace"):
        """engine: 'scan' (lax.scan, differentiable, default) or 'cpp'
        (native sequential filter for host/CPU evaluation — the
        state_space_cython equivalent; log_likelihood/predict only,
        optimize always uses the differentiable scan path).

        parallel: chunked-hybrid temporal parallelization — sequential
        element composition within C ~ sqrt(N) chunks (vmapped across
        chunks), one short scan across chunk totals, then a vmapped
        in-chunk refilter. Exact (same fixed point as the sequential
        filter); wall-clock wins when the sequential scan is
        latency-bound (large N, small state dim).

        stable: square-root (QR array) covariance filter — propagates a
        Cholesky-like factor S with P = S S', so the covariance stays PSD
        by construction on long ill-conditioned series (the reference's
        SVD-stabilized updates, state_space_main.py:1894, exist for the
        same reason). Sequential only; slightly more FLOPs per step."""
        super().__init__(name=name)
        dt = default_dtype()
        X = np.asarray(X, dtype=float).reshape(-1)
        Y = np.asarray(Y, dtype=float).reshape(-1, 1)
        order = np.argsort(X)
        self._order = order
        self.__dict__["X"] = jnp.asarray(X[order], dtype=dt)
        self.__dict__["Y"] = jnp.asarray(Y[order], dtype=dt)
        self.num_data = X.shape[0]
        self.kern = kernel or Matern32(1)
        self.parallel = bool(parallel)  # chunked-hybrid parallel filter
        self.parallel_chunks = parallel_chunks
        self.stable = bool(stable)
        self.engine = engine
        self._add_param("noise_var", noise_var, transform=Logexp())

    # --- core filter --------------------------------------------------------
    def _ssm(self, times):
        """Discretized state-space model over the time grid.

        Returns (H, P0, A, Q, sigma2) with A, Q of shape (N-1, s, s).
        Stationary blocks use the exact Q = Pinf - A Pinf A'; nonstationary
        blocks (Linear/Brownian) use the Van Loan integral, which stays
        finite where Pinf does not exist. White summands fold into sigma2.

        stable mode uses Van Loan for EVERY block: the Pinf - A Pinf A'
        shortcut is a difference of O(kernel-variance) matrices, which at
        f32 loses Q entirely when dt << lengthscale (measured: NaN NLML at
        lengthscale ratio 1e4); the Van Loan integral computes Q directly
        at its own scale with no cancellation.
        """
        parts, white = sde_parts(self.kern, t0=times[0])
        if not parts:
            raise ValueError("kernel has no SDE state (White-only kernel?)")
        dts = jnp.diff(times)
        dt = times.dtype
        from ..util.linalg import expm_safe as expm
        sizes = [p[0].shape[0] for p in parts]
        s = int(sum(sizes))
        A = jnp.zeros((dts.shape[0], s, s), dtype=dt)
        Q = jnp.zeros((dts.shape[0], s, s), dtype=dt)
        off = 0
        for (F, L, Qc, _H, Pinf, _P0, stationary), sp in zip(parts, sizes):
            if stationary and not getattr(self, "stable", False):
                def one(dt_, F=F, Pinf=Pinf):
                    Ap = expm(F * dt_)
                    return Ap, Pinf - Ap @ Pinf @ Ap.T
            else:
                def one(dt_, F=F, LQcLt=L @ Qc @ L.T):
                    return _van_loan(F, LQcLt, dt_)
            Ap, Qp = jax.vmap(one)(dts)
            A = A.at[:, off:off + sp, off:off + sp].set(Ap.astype(dt))
            Q = Q.at[:, off:off + sp, off:off + sp].set(Qp.astype(dt))
            off += sp
        H = jnp.concatenate([p[3] for p in parts], axis=1).astype(dt)
        P0 = jax.scipy.linalg.block_diag(*[jnp.asarray(p[5]) for p in parts]).astype(dt)
        sigma2 = jnp.asarray(self.noise_var) + white
        return H, P0, A, Q, sigma2

    def _filter_parallel(self, times, ys, obs_mask=None):
        """Chunked-hybrid temporal-parallel Kalman filter.

        Round-1 measurement: the pure `associative_scan` formulation
        (Sarkka & Garcia-Fernandez 2020) over per-step elements was 19x
        SLOWER than sequential `lax.scan` on TPU — tiny (s x s) element
        algebra loses to the sequential scan's ~19us/step latency floor.
        The fix is a 3-phase chunked hybrid with C ~ sqrt(N) chunks:

          1. vmap over chunks: sequentially compose the per-step affine
             elements within each chunk (L = N/C scan steps, C-way
             parallel) -> one composite element per chunk;
          2. one short sequential scan over the C chunk totals -> the
             exact filtered state entering each chunk;
          3. vmap over chunks: re-run the plain Kalman recursion within
             each chunk from its entry state (L steps, C-way parallel).

        Scan depth drops from N to ~2N/C + C; the per-step element algebra
        is a constant factor. Exact in exact arithmetic (the elements
        parameterize p(x_k | y..., x_entry) exactly). GPy has no
        equivalent (its Kalman loop is sequential Cython).

        Returns the same tuple as `_filter`.
        """
        # degenerate series (single point: no step elements to compose) and
        # pre-change serialized models (no parallel_chunks in __dict__) both
        # route through the sequential filter
        if times.shape[0] < 2:
            return self._filter(times, ys, obs_mask)
        import jax.tree_util as jtu

        H, P0, A, Q, sigma2 = self._ssm(times)
        s = P0.shape[0]
        dt = times.dtype
        n = ys.shape[0]
        if obs_mask is None:
            obs_mask = jnp.ones(n, dtype=bool)
        eyeS = jnp.eye(s, dtype=dt)
        Hv = H  # (1, s)

        # --- per-step elements (Sarkka & Garcia-Fernandez eq. 10-12) -----
        def make_element(A_k, Q_k, y, observed):
            # unobserved step: pure prediction element
            S = (Hv @ Q_k @ Hv.T)[0, 0] + sigma2
            K = (Q_k @ Hv.T) / S  # (s,1)
            A_e = jnp.where(observed, (eyeS - K @ Hv) @ A_k, A_k)
            b_e = jnp.where(observed, (K * y)[:, 0], jnp.zeros(s, dtype=dt))
            C_e = jnp.where(observed, (eyeS - K @ Hv) @ Q_k, Q_k)
            eta_e = jnp.where(observed, (A_k.T @ Hv.T / S * y)[:, 0], jnp.zeros(s, dtype=dt))
            J_e = jnp.where(observed, A_k.T @ Hv.T @ Hv @ A_k / S, jnp.zeros((s, s), dtype=dt))
            return A_e, b_e, C_e, eta_e, J_e

        # --- associative composition (i before j) ------------------------
        def combine(ei, ej):
            Ai, bi, Ci, etai, Ji = ei
            Aj, bj, Cj, etaj, Jj = ej
            sdim = Ai.shape[-1]
            I = jnp.eye(sdim, dtype=Ai.dtype)
            # A_j (I + C_i J_j)^{-1}  ==  solve((I + C_i J_j)^T, A_j^T)^T
            M = solve_lu_safe(
                jnp.swapaxes(I + Ci @ Jj, -1, -2), jnp.swapaxes(Aj, -1, -2)
            )
            AjM = jnp.swapaxes(M, -1, -2)
            A_new = AjM @ Ai
            b_new = (AjM @ (bi[..., None] + Ci @ etaj[..., None]))[..., 0] + bj
            C_new = AjM @ Ci @ jnp.swapaxes(Aj, -1, -2) + Cj
            eta_new = (jnp.swapaxes(Ai, -1, -2) @ solve_lu_safe(I + Jj @ Ci, (etaj - (Jj @ bi[..., None])[..., 0])[..., None]))[..., 0] + etai
            J_new = jnp.swapaxes(Ai, -1, -2) @ solve_lu_safe(I + Jj @ Ci, Jj @ Ai) + Ji
            return A_new, b_new, C_new, eta_new, J_new

        # --- shared sequential pieces ------------------------------------
        def update(m_pred, P_pred, y, observed):
            v = y - (Hv @ m_pred)[0, 0]
            S = (Hv @ P_pred @ Hv.T)[0, 0] + sigma2
            K = (P_pred @ Hv.T) / S
            m_new = m_pred + K * v
            P_new = P_pred - K @ (Hv @ P_pred)
            ll = -0.5 * (LOG_2_PI + jnp.log(S) + v**2 / S)
            return (
                jnp.where(observed, m_new, m_pred),
                jnp.where(observed, P_new, P_pred),
                jnp.where(observed, ll, 0.0),
            )

        def step(carry, inp):
            m, P = carry
            A_n, Q_n, y, observed = inp
            m_pred = A_n @ m
            P_pred = A_n @ P @ A_n.T + Q_n
            P_pred = 0.5 * (P_pred + P_pred.T)
            m_new, P_new, ll = update(m_pred, P_pred, y, observed)
            return (m_new, P_new), (m_new, P_new, m_pred, P_pred, ll)

        # step 1: filter update of the prior (m0 = 0, P0)
        m0 = jnp.zeros((s, 1), dtype=dt)
        m1, P1, ll1 = update(m0, P0, ys[0], obs_mask[0])

        # --- chunking (steps 2..N; pad with identity steps) --------------
        n_el = n - 1
        C = (getattr(self, "parallel_chunks", None)
             or max(1, min(256, int(np.sqrt(max(n_el, 1)) * 2))))
        C = min(C, max(n_el, 1))
        L = -(-n_el // C)
        pad = C * L - n_el
        A_p = jnp.concatenate([A, jnp.broadcast_to(eyeS, (pad, s, s))], 0)
        Q_p = jnp.concatenate([Q, jnp.zeros((pad, s, s), dtype=dt)], 0)
        y_p = jnp.concatenate([ys[1:], jnp.zeros(pad, dtype=dt)], 0)
        mask_p = jnp.concatenate([obs_mask[1:], jnp.zeros(pad, dtype=bool)], 0)
        chunked = lambda a: a.reshape((C, L) + a.shape[1:])

        els = jax.vmap(make_element)(A_p, Q_p, y_p, mask_p)
        elsC = jtu.tree_map(chunked, els)

        # phase 1: within-chunk element composition -> chunk totals
        def compose_chunk(chunk):
            e0 = jtu.tree_map(lambda a: a[0], chunk)
            rest = jtu.tree_map(lambda a: a[1:], chunk)
            tot, _ = lax.scan(lambda c, e: (combine(c, e), None), e0, rest)
            return tot

        totals = jax.vmap(compose_chunk)(elsC)

        # phase 2: short scan across chunk totals -> chunk entry states.
        # A filtered state (m, P) is itself the element (0, m, P, 0, 0);
        # applying a composite element to it gives the filtered state at
        # the composite's end (exactly how the first element embeds the
        # prior in the pure associative formulation).
        state0 = (jnp.zeros((s, s), dtype=dt), m1[:, 0], P1,
                  jnp.zeros(s, dtype=dt), jnp.zeros((s, s), dtype=dt))

        def ph2(carry, e):
            return combine(carry, e), (carry[1], carry[2])

        _, (m_starts, P_starts) = lax.scan(ph2, state0, totals)
        # m_starts[c], P_starts[c]: filtered state ENTERING chunk c

        # phase 3: vmapped in-chunk refilter from the entry states
        def refilter(m_st, P_st, A_c, Q_c, y_c, mask_c):
            _, outs = lax.scan(step, (m_st[:, None], P_st), (A_c, Q_c, y_c, mask_c))
            return outs

        ms3, Ps3, mpreds3, Ppreds3, lls3 = jax.vmap(refilter)(
            m_starts, P_starts, chunked(A_p), chunked(Q_p), chunked(y_p), chunked(mask_p)
        )
        flat = lambda a: a.reshape((C * L,) + a.shape[2:])[:n_el]
        ms = jnp.concatenate([m1[None], flat(ms3)], 0)
        Ps = jnp.concatenate([P1[None], flat(Ps3)], 0)
        mpreds = jnp.concatenate([m0[None], flat(mpreds3)], 0)
        Ppreds = jnp.concatenate([P0[None], flat(Ppreds3)], 0)
        logL = ll1 + jnp.sum(flat(lls3))
        return logL, ms, Ps, mpreds, Ppreds, A, H

    def _filter(self, times, ys, obs_mask=None):
        """Kalman filter. Returns (logL, filtered means, covs, pred means/covs)."""
        H, P0, A, Q, sigma2 = self._ssm(times)
        s = P0.shape[0]
        m0 = jnp.zeros((s, 1), dtype=times.dtype)
        if obs_mask is None:
            obs_mask = jnp.ones(ys.shape[0], dtype=bool)

        def update(m_pred, P_pred, y, observed):
            v = y - (H @ m_pred)[0, 0]
            S = (H @ P_pred @ H.T)[0, 0] + sigma2
            K = (P_pred @ H.T) / S
            m_new = m_pred + K * v
            P_new = P_pred - K @ (H @ P_pred)
            ll = -0.5 * (LOG_2_PI + jnp.log(S) + v**2 / S)
            m_out = jnp.where(observed, m_new, m_pred)
            P_out = jnp.where(observed, P_new, P_pred)
            ll = jnp.where(observed, ll, 0.0)
            return m_out, P_out, ll

        # first step: predict = prior
        m1, P1, ll1 = update(m0, P0, ys[0], obs_mask[0])

        def step(carry, inp):
            m, P = carry
            A_n, Q_n, y, observed = inp
            m_pred = A_n @ m
            P_pred = A_n @ P @ A_n.T + Q_n
            P_pred = 0.5 * (P_pred + P_pred.T)
            m_new, P_new, ll = update(m_pred, P_pred, y, observed)
            return (m_new, P_new), (m_new, P_new, m_pred, P_pred, ll)

        (mT, PT), (ms, Ps, mpreds, Ppreds, lls) = lax.scan(
            step, (m1, P1), (A, Q, ys[1:], obs_mask[1:])
        )
        ms = jnp.concatenate([m1[None], ms], 0)
        Ps = jnp.concatenate([P1[None], Ps], 0)
        mpreds = jnp.concatenate([m0[None], mpreds], 0)
        Ppreds = jnp.concatenate([P0[None], Ppreds], 0)
        logL = ll1 + jnp.sum(lls)
        return logL, ms, Ps, mpreds, Ppreds, A, H

    def _filter_sqrt(self, times, ys, obs_mask=None):
        """Square-root (QR array) Kalman filter: propagate S with P = S S'.

        The covariance stays PSD by construction — the TPU-native
        equivalent of the reference's SVD-stabilized update
        (state_space_main.py:1894 `_kalman_update_step_SVD`), which exists
        because the vanilla recursion P <- P - K H P loses definiteness on
        long ill-conditioned series; at f32 we are MORE exposed than the
        reference's f64. Kailath array algorithm, scalar observations:

          predict: qr([S' A'; Qs'])            -> S_pred
          update:  qr([sqrt(r) 0; S'H' S']')   -> [sqrt(Sy) 0; K*sqrt(Sy) S_new]

        Per-step cost is one (2s x s) and one (s+1 x s+1) QR instead of two
        (s x s) matmuls. Differentiable (QR has a JVP rule); the row-sign
        ambiguity of R cancels in every extracted quantity.

        Returns the same tuple as `_filter` (covariances reconstructed as
        S S' — PSD by construction).
        """
        H, P0, A, Q, sigma2 = self._ssm(times)
        s = P0.shape[0]
        dt = times.dtype
        if obs_mask is None:
            obs_mask = jnp.ones(ys.shape[0], dtype=bool)

        def psd_sqrt(M):
            # jittered Cholesky, not eigh: eigh's VJP is NaN at the repeated
            # eigenvalues near-zero Q routinely has; the relative jitter is
            # below the filter's own roundoff at either precision. The
            # absolute 1e-30 floor keeps chol defined for the EXACTLY zero
            # Q of duplicate time points (dt=0 after f32 time rounding).
            eps = 1e-12 if dt == jnp.float64 else 1e-6
            d = jnp.maximum(jnp.trace(M) / M.shape[0], 1e-30)
            return jnp.linalg.cholesky(M + (eps * d) * jnp.eye(M.shape[0], dtype=dt))

        S0 = psd_sqrt(P0)
        sqrtQ = jax.vmap(psd_sqrt)(Q)
        sqrt_r = jnp.sqrt(sigma2)

        def update(m_pred, S_pred, y, observed):
            HS = (H @ S_pred)  # (1, s)
            pre = jnp.zeros((1 + s, 1 + s), dtype=dt)
            pre = pre.at[0, 0].set(sqrt_r).at[0, 1:].set(HS[0]).at[1:, 1:].set(S_pred)
            post = jnp.linalg.qr(pre.T, mode="r").T  # lower (1+s, 1+s)
            Sy = post[0, 0] ** 2
            K = post[1:, 0:1] / post[0, 0]  # row-sign cancels
            v = y - (H @ m_pred)[0, 0]
            m_new = m_pred + K * v
            S_new = post[1:, 1:]
            ll = -0.5 * (LOG_2_PI + jnp.log(Sy) + v**2 / Sy)
            return (
                jnp.where(observed, m_new, m_pred),
                jnp.where(observed, S_new, S_pred),
                jnp.where(observed, ll, 0.0),
            )

        m0 = jnp.zeros((s, 1), dtype=dt)
        m1, S1, ll1 = update(m0, S0, ys[0], obs_mask[0])

        def step(carry, inp):
            m, S = carry
            A_n, Qs_n, y, observed = inp
            m_pred = A_n @ m
            pre = jnp.concatenate([S.T @ A_n.T, Qs_n.T], 0)  # (2s, s)
            S_pred = jnp.linalg.qr(pre, mode="r").T  # lower (s, s)
            m_new, S_new, ll = update(m_pred, S_pred, y, observed)
            return (m_new, S_new), (m_new, S_new, m_pred, S_pred, ll)

        _, (ms, Ss, mpreds, Spreds, lls) = lax.scan(
            step, (m1, S1), (A, sqrtQ, ys[1:], obs_mask[1:])
        )
        ms = jnp.concatenate([m1[None], ms], 0)
        Ss = jnp.concatenate([S1[None], Ss], 0)
        mpreds = jnp.concatenate([m0[None], mpreds], 0)
        Spreds = jnp.concatenate([S0[None], Spreds], 0)
        Ps = jnp.einsum("nij,nkj->nik", Ss, Ss)
        Ppreds = jnp.einsum("nij,nkj->nik", Spreds, Spreds)
        logL = ll1 + jnp.sum(lls)
        return logL, ms, Ps, mpreds, Ppreds, A, H

    def _smooth(self, ms, Ps, mpreds, Ppreds, A):
        """RTS smoother (backward scan). GPy: state_space_main.py rts_smoother."""
        n = ms.shape[0]

        def step(carry, inp):
            m_next_s, P_next_s = carry
            m_f, P_f, m_pred_next, P_pred_next, A_n = inp
            # SPD predicted covariance: Cholesky solve (generic inv is an
            # LU, which TPU lacks for f64)
            S = P_pred_next + 1e-12 * jnp.eye(P_pred_next.shape[0], dtype=P_f.dtype)
            G = jax.scipy.linalg.cho_solve(
                (jnp.linalg.cholesky(S), True), A_n @ P_f.T).T
            m_s = m_f + G @ (m_next_s - m_pred_next)
            P_s = P_f + G @ (P_next_s - P_pred_next) @ G.T
            return (m_s, P_s), (m_s, P_s)

        init = (ms[-1], Ps[-1])
        inps = (ms[:-1][::-1], Ps[:-1][::-1], mpreds[1:][::-1], Ppreds[1:][::-1], A[::-1])
        _, (ms_s, Ps_s) = lax.scan(step, init, inps)
        ms_s = jnp.concatenate([ms_s[::-1], ms[-1][None]], 0)
        Ps_s = jnp.concatenate([Ps_s[::-1], Ps[-1][None]], 0)
        return ms_s, Ps_s

    def _filter_cpp(self, times, ys, obs_mask=None):
        """Native sequential filter (gpy_tpu/native/kalman.cpp). Same
        return signature as `_filter` but with numpy outputs — value
        evaluation only (no autodiff through ctypes)."""
        from .. import native

        H, P0, A, Q, sigma2 = self._ssm(times)
        n = np.asarray(ys).shape[0]
        mask = np.ones(n, dtype=bool) if obs_mask is None else np.asarray(obs_mask)
        logL, ms, Ps, mpreds, Ppreds = native.kalman_filter_cpp(
            np.asarray(A), np.asarray(Q), np.asarray(H), np.asarray(ys),
            mask, np.asarray(P0), float(np.asarray(sigma2)))
        return logL, ms, Ps, mpreds, Ppreds, np.asarray(A), np.asarray(H)

    def _pick_filter(self):
        if self.engine == "cpp":
            return self._filter_cpp
        if getattr(self, "stable", False):
            return self._filter_sqrt
        return self._filter_parallel if self.parallel else self._filter

    # --- Model interface ----------------------------------------------------
    def log_likelihood(self):
        logL, *_ = self._pick_filter()(self.X, self.Y[:, 0])
        return logL

    def _flat_objective(self, flat):
        # autodiff cannot flow through the native engine; the traced
        # objective (optimize/checkgrad) always uses the scan filter
        if self.engine == "cpp":
            m = self.with_flat_raw(flat)
            m.__dict__["engine"] = "scan"
            return m.objective_function()
        return super()._flat_objective(flat)

    def predict(self, Xnew, include_likelihood=True):
        """Filter+smooth over merged train/test times; test rows unobserved.

        GPy: state_space.py predict (Cython path state_space_cython.pyx).
        """
        Xnew = np.asarray(Xnew, dtype=float).reshape(-1)
        Xtr = np.asarray(self.X)
        allX = np.concatenate([Xtr, Xnew])
        order = np.argsort(allX, kind="stable")
        inv = np.argsort(order)
        times = jnp.asarray(allX[order], dtype=self.X.dtype)
        ys = jnp.asarray(
            np.concatenate([np.asarray(self.Y)[:, 0], np.zeros_like(Xnew)])[order],
            dtype=self.X.dtype,
        )
        mask = jnp.asarray(
            np.concatenate([np.ones_like(Xtr, dtype=bool), np.zeros_like(Xnew, dtype=bool)])[order]
        )
        # guard against zero dt (duplicate times): add tiny epsilon spacing
        if self.engine == "cpp":
            from .. import native

            _, ms, Ps, mpreds, Ppreds, A, H = self._pick_filter()(times, ys, mask)
            ms_s, Ps_s = native.rts_smoother_cpp(ms, Ps, mpreds, Ppreds, A)
            mu_all = jnp.einsum("ij,njk->ni", H, ms_s)  # (n,1)
            var_all = jnp.einsum("ij,njk,lk->nil", H, Ps_s, H)[:, 0, 0]
            _, white = sde_parts(self.kern, t0=times[0])
            var_all = var_all + jnp.asarray(white)
            if include_likelihood:
                var_all = var_all + jnp.asarray(self.noise_var)
        else:
            # whole filter+smoother+readout as ONE cached jitted program:
            # running it eagerly costs one ~24ms tunnel dispatch per op on
            # TPU (same disease the compiled GP predict path fixed)
            key = ("sspred", times.shape, str(times.dtype),
                   bool(include_likelihood), self.parallel,
                   getattr(self, "stable", False), self.structure_version())
            cache = self.__dict__.setdefault("_predict_exec_cache", {})
            fn = cache.get(key)
            if fn is None:
                def _fn(fl, t, y, mk):
                    mod = self.with_flat_raw(fl)
                    _, ms, Ps, mpreds, Ppreds, A, H = mod._pick_filter()(t, y, mk)
                    ms_s, Ps_s = mod._smooth(ms, Ps, mpreds, Ppreds, A)
                    mu_all = jnp.einsum("ij,njk->ni", H, ms_s)  # (n,1)
                    var_all = jnp.einsum("ij,njk,lk->nil", H, Ps_s, H)[:, 0, 0]
                    # White summands carry no state; their variance is part
                    # of the latent f at new points (dense-GP semantics:
                    # Kdiag includes it).
                    _, white = sde_parts(mod.kern, t0=t[0])
                    var_all = var_all + white
                    if include_likelihood:
                        var_all = var_all + jnp.asarray(mod.noise_var)
                    return mu_all, var_all

                import jax as _jax
                fn = cache[key] = _jax.jit(_fn)
            mu_all, var_all = fn(jnp.asarray(self.get_flat_raw()), times, ys, mask)
        import jax as _jax
        mu_all, var_all = _jax.device_get((mu_all, var_all))
        mu = np.asarray(mu_all)[inv][len(Xtr):]
        var = np.asarray(var_all)[inv][len(Xtr):]
        return mu.reshape(-1, 1), np.maximum(var, 1e-12).reshape(-1, 1)
