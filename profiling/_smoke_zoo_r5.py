"""Cross-platform model-zoo smoke: objective + gradient for every model
family, printed as JSON so a CPU run and a TPU run can be diffed.

The Laplace f=0 bug (round 5) was CPU-green but silently wrong on TPU;
this sweep is the oracle that catches that class: identical seeded
construction on both platforms, compare objective and gradient.

Usage:
  SMOKE_CPU=1 python profiling/_smoke_zoo_r5.py > /tmp/zoo_cpu.json
  python profiling/_smoke_zoo_r5.py > /tmp/zoo_tpu.json   # on TPU
  python profiling/_smoke_zoo_r5.py --compare /tmp/zoo_cpu.json /tmp/zoo_tpu.json
"""
import json
import os
import sys
import time

if os.environ.get("SMOKE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

if "--compare" in sys.argv:
    i = sys.argv.index("--compare")
    a = json.load(open(sys.argv[i + 1]))
    b = json.load(open(sys.argv[i + 2]))
    bad = 0
    for name in sorted(set(a) | set(b)):
        ra, rb = a.get(name), b.get(name)
        if ra is None or rb is None:
            print(f"MISSING {name}: cpu={ra is not None} tpu={rb is not None}")
            bad += 1
            continue
        if "error" in ra or "error" in rb:
            print(f"ERROR   {name}: cpu={ra.get('error')} tpu={rb.get('error')}")
            bad += 1
            continue
        import math
        dobj = abs(ra["obj"] - rb["obj"]) / max(1.0, abs(ra["obj"]))
        # gradient direction: cosine between the two stored grad heads
        ga, gb = ra["ghead"], rb["ghead"]
        num = sum(x * y for x, y in zip(ga, gb))
        den = math.sqrt(sum(x * x for x in ga)) * math.sqrt(sum(y * y for y in gb))
        cos = num / den if den > 0 else 1.0
        dgn = abs(ra["gnorm"] - rb["gnorm"]) / max(1.0, abs(ra["gnorm"]))
        ok = dobj < 2e-3 and cos > 0.999 and dgn < 2e-2
        tag = "ok     " if ok else "DIVERGE"
        print(f"{tag} {name}: dobj={dobj:.2e} cos={cos:.6f} dgnorm={dgn:.2e}"
              f" obj={ra['obj']:.6g}/{rb['obj']:.6g}")
        bad += 0 if ok else 1
    sys.exit(1 if bad else 0)

import numpy as np  # noqa: E402
import jax  # noqa: E402

import gpy_tpu.kern as gk  # noqa: E402
import gpy_tpu.models as gm  # noqa: E402
import gpy_tpu.mappings as mappings  # noqa: E402
from gpy_tpu.likelihoods import Bernoulli  # noqa: E402


def _data(seed, *shape):
    return np.random.default_rng(seed).standard_normal(shape)


def builders():
    out = {}

    def reg(name):
        def deco(fn):
            out[name] = fn
            return fn
        return deco

    @reg("gp_regression_n2048_blocked")
    def _():
        # n=2048 deliberately sits on the blocked-cholesky path (threshold
        # 2047) — the round-5 jitter-ladder bug lived exactly here.
        X = _data(0, 2048, 4)
        Y = np.sin(X[:, :1]) + 0.1 * _data(1, 2048, 1)
        return gm.GPRegression(X, Y, gk.RBF(4, ARD=True))

    @reg("warped_gp")
    def _():
        X = np.linspace(0, 5, 300).reshape(-1, 1)
        Y = np.exp(np.sin(X) + 0.1 * _data(2, 300, 1))
        return gm.WarpedGP(X, Y)

    @reg("input_warped_gp")
    def _():
        X = np.abs(_data(3, 100, 2)) * 2
        Y = np.sin(X[:, :1] ** 2) + 0.1 * _data(4, 100, 1)
        return gm.InputWarpedGP(X, Y)

    @reg("tp_regression")
    def _():
        X = np.linspace(0, 5, 300).reshape(-1, 1)
        Y = np.sin(X) + 0.1 * _data(5, 300, 1)
        return gm.TPRegression(X, Y, deg_free=4.0)

    @reg("heteroscedastic")
    def _():
        X = np.linspace(0, 5, 200).reshape(-1, 1)
        Y = np.sin(X) + 0.1 * _data(6, 200, 1)
        return gm.GPHeteroscedasticRegression(X, Y)

    @reg("offset_regression")
    def _():
        x = np.linspace(0, 5, 60).reshape(-1, 1)
        X = np.vstack([np.hstack([x, np.zeros((60, 1))]),
                       np.hstack([x, np.ones((60, 1))])])
        Y = np.vstack([np.sin(x), np.sin(x + 0.7)])
        return gm.GPOffsetRegression(X, Y, noise_var=0.01)

    @reg("var_gauss_approx")
    def _():
        X = np.linspace(0, 4, 100).reshape(-1, 1)
        Y = (np.sin(X) + 0.2 * _data(7, 100, 1) > 0).astype(float)
        return gm.GPVariationalGaussianApproximation(X, Y, gk.RBF(1), Bernoulli())

    @reg("gp_classification_ep")
    def _():
        X = _data(8, 200, 2)
        Y = ((X[:, :1] + X[:, 1:2]) > 0).astype(float)
        return gm.GPClassification(X, Y)

    @reg("gp_classification_laplace")
    def _():
        X = _data(9, 200, 2)
        Y = ((X[:, :1] - X[:, 1:2]) > 0).astype(float)
        return gm.GPClassificationLaplace(X, Y)

    @reg("sparse_classification")
    def _():
        X = _data(10, 200, 2)
        Y = ((X[:, :1] + X[:, 1:2]) > 0).astype(float)
        return gm.SparseGPClassification(X, Y, num_inducing=16)

    @reg("sparse_classification_uncertain")
    def _():
        X = _data(11, 80, 2)
        Xvar = 0.05 * np.ones((80, 2))
        Y = ((X[:, :1]) > 0).astype(float)
        return gm.SparseGPClassificationUncertainInput(X, Xvar, Y, num_inducing=12)

    @reg("gplvm")
    def _():
        Y = _data(12, 40, 6)
        return gm.GPLVM(Y, 2)

    @reg("sparse_gplvm")
    def _():
        Y = _data(13, 40, 6)
        return gm.SparseGPLVM(Y, 2, num_inducing=10)

    @reg("bcgplvm")
    def _():
        t = np.linspace(0, 2 * np.pi, 30)
        Y = np.c_[np.sin(t), np.cos(t), np.sin(2 * t)] + 0.05 * _data(14, 30, 3)
        return gm.BCGPLVM(Y, 2)

    @reg("bcgplvm_linear_map")
    def _():
        Y = _data(15, 30, 3)
        return gm.BCGPLVM(Y, 2, mapping=mappings.Linear(3, 2))

    @reg("bayesian_gplvm")
    def _():
        Y = _data(16, 40, 6)
        return gm.BayesianGPLVM(Y, 2, num_inducing=10)

    @reg("bayesian_gplvm_minibatch")
    def _():
        Y = _data(17, 60, 6)
        return gm.BayesianGPLVMMiniBatch(Y, 2, num_inducing=10, batchsize=20)

    @reg("dp_bayesian_gplvm")
    def _():
        from gpy_tpu.core.priors import DGPLVM
        N = 30
        labels = np.random.default_rng(18).integers(0, 2, N)
        labels[:2] = [0, 1]
        onehot = np.zeros((N, 2)); onehot[np.arange(N), labels] = 1
        Y = _data(19, N, 4) + 2.0 * onehot[:, :1]
        return gm.DPBayesianGPLVM(Y, 2, DGPLVM(1.0, onehot, (N, 2)), num_inducing=8)

    @reg("mrd")
    def _():
        Ylist = [_data(20, 30, 5), _data(21, 30, 4)]
        return gm.MRD(Ylist, 3, num_inducing=8)

    @reg("ssgplvm")
    def _():
        Y = _data(22, 30, 6)
        return gm.SSGPLVM(Y, 2, num_inducing=8)

    @reg("ibp_lfm")
    def _():
        X = np.hstack([np.linspace(0, 5, 40).reshape(-1, 1),
                       np.zeros((40, 1))])
        Y = np.sin(X[:, :1]) + 0.1 * _data(23, 40, 1)
        return gm.IBPLFM(X, Y, rank=2)

    @reg("sparse_coregionalized")
    def _():
        X1 = np.linspace(0, 5, 30).reshape(-1, 1)
        Y1 = np.sin(X1) + 0.05 * _data(24, 30, 1)
        Y2 = np.cos(X1) + 0.05 * _data(25, 30, 1)
        return gm.SparseGPCoregionalizedRegression([X1, X1], [Y1, Y2], num_inducing=8)

    @reg("sparse_minibatch")
    def _():
        from gpy_tpu.likelihoods import Gaussian
        X = _data(26, 120, 2)
        Y = np.sin(X[:, :1]) + 0.1 * _data(27, 120, 1)
        Z = X[:10].copy()
        return gm.SparseGPMiniBatch(X, Y, Z, gk.RBF(2), Gaussian(),
                                    batchsize=40)

    @reg("multioutput_gp")
    def _():
        X = np.linspace(0, 5, 50).reshape(-1, 1)
        Y1 = np.sin(X) + 0.05 * _data(28, 50, 1)
        Y2 = np.cos(X) + 0.05 * _data(29, 50, 1)
        from gpy_tpu.kern import RBF
        k = RBF(1)
        from gpy_tpu.likelihoods import Gaussian
        return gm.MultioutputGP([X, X], [Y1, Y2], [k, k],
                                [Gaussian(variance=0.05), Gaussian(variance=0.05)])

    @reg("state_space")
    def _():
        X = np.linspace(0, 10, 400).reshape(-1, 1)
        Y = np.sin(X) + 0.1 * _data(30, 400, 1)
        return gm.StateSpace(X, Y, kernel=gk.sde_Matern32(1))

    @reg("gp_multiout_regression")
    def _():
        X = np.linspace(0, 5, 40).reshape(-1, 1)
        Y = np.hstack([np.sin(X), np.cos(X), np.sin(2 * X), np.cos(2 * X)]) \
            + 0.05 * _data(31, 40, 4)
        return gm.GPMultioutRegression(X, Y, 2, num_inducing=(8, 3))

    @reg("ssmrd")
    def _():
        Ylist = [_data(32, 25, 4), _data(33, 25, 5)]
        return gm.SSMRD(Ylist, 2, num_inducing=6)

    return out


def main():
    results = {}
    only = os.environ.get("SMOKE_ONLY")
    only = set(only.split(",")) if only else None
    for name, build in builders().items():
        if only is not None and name not in only:
            continue
        t0 = time.time()
        try:
            # mappings (Linear/MLP) init from the global legacy RNG
            # (GPy-compatible): seed it so both platforms build the
            # identical model
            np.random.seed(12345)
            m = build()
            if hasattr(m, "objective_function"):
                obj = float(m.objective_function())
                g = np.asarray(m.objective_function_gradients()).ravel()
            else:  # SSMRD-style multi-view containers
                obj = sum(float(v.objective_function()) for v in m.models)
                g = np.concatenate([
                    np.asarray(v.objective_function_gradients()).ravel()
                    for v in m.models])
            results[name] = {
                "obj": obj,
                "gnorm": float(np.linalg.norm(g)),
                "ghead": [float(x) for x in g[:8]],
                "nparam": int(g.size),
                "finite": bool(np.isfinite(obj) and np.all(np.isfinite(g))),
                "sec": round(time.time() - t0, 2),
            }
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": f"{type(e).__name__}: {e}", "sec": round(time.time() - t0, 2)}
        print(f"# {name}: {results[name]}", file=sys.stderr, flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
