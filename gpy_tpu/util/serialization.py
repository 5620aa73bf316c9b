"""Serialization: JSON save/load of whole models (portable) — checkpoint/resume.

Reference: GPy's two mechanisms (SURVEY.md §5): paramz pickling (m.pickle /
GPy.load, GPy/__init__.py:41-58) and portable JSON to_dict/from_dict with
class-string dispatch via eval (GPy/core/model.py:22-55, gp.py:110-183).

TPU design: one generic recursive encoder over the Module tree — every
class serializes automatically (no per-class to_dict boilerplate), and
class strings resolve ONLY inside the gpy_tpu namespace (no eval of
arbitrary code, unlike the reference). Arrays round-trip with dtype/shape.
"""
from __future__ import annotations

import gzip
import importlib
import json
from typing import Any

import numpy as np
import jax.numpy as jnp

from ..core.module import Module, ParamSpec
from ..core.transformations import Transform
from ..core.priors import Prior

__all__ = ["to_dict", "from_dict", "save_model", "load_model"]

_SKIP_KEYS = {"_objgrad_cache", "_posterior_cache", "_batch_start",
              "_fit_chunk_cache", "_optax_chunk_cache", "_k_fn", "_kdiag_fn",
              "_predict_exec_cache", "_posterior_exec_cache",
              "_fit_shuffle_cache", "_sample_cache"}  # compiled/lambdified callables + device caches: rebuilt on load


def _classpath(obj) -> str:
    cls = type(obj)
    return f"{cls.__module__}.{cls.__qualname__}"


def _resolve(path: str):
    assert path.startswith("gpy_tpu.") or path.startswith("numpy"), (
        f"refusing to resolve class outside gpy_tpu: {path}"
    )
    mod, _, name = path.rpartition(".")
    m = importlib.import_module(mod)
    return getattr(m, name)


def _enc(x: Any, memo: dict | None = None) -> Any:
    # Modules appear in the tree BOTH as attributes and in _children (same
    # object); without identity-preserving encoding they decode into split
    # copies and post-load mutation writes to one while the objective reads
    # the other. Modules are therefore memoized: the first encounter
    # serializes, later encounters emit a reference.
    if memo is None:
        memo = {}
    if isinstance(x, Module):
        if id(x) in memo:
            return {"__modref__": memo[id(x)]}
        idx = memo[id(x)] = len(memo)
        return {
            "__module__": _classpath(x),
            "id": idx,
            "dict": {k: _enc(v, memo) for k, v in x.__dict__.items() if k not in _SKIP_KEYS},
        }
    if isinstance(x, ParamSpec):
        return {
            "__paramspec__": True,
            "transform": _enc(x.transform, memo),
            "prior": _enc(x.prior, memo),
            "fixed": bool(x.fixed),
        }
    if isinstance(x, Transform) or isinstance(x, Prior):
        return {"__obj__": _classpath(x), "dict": {k: _enc(v, memo) for k, v in x.__dict__.items()}}
    if isinstance(x, (jnp.ndarray, np.ndarray)):
        arr = np.asarray(x)
        return {"__array__": arr.tolist(), "dtype": str(arr.dtype), "shape": list(arr.shape)}
    if isinstance(x, np.generic):
        return x.item()
    if isinstance(x, dict):
        return {"__dict__": {k: _enc(v, memo) for k, v in x.items()}}
    if isinstance(x, (list, tuple)):
        return {"__seq__": [_enc(v, memo) for v in x], "tuple": isinstance(x, tuple)}
    if isinstance(x, (int, float, str, bool)) or x is None:
        return x
    if isinstance(x, slice):
        return {"__slice__": [x.start, x.stop, x.step]}
    if type(x).__module__.split(".")[0] == "sympy":
        import sympy

        return {"__sympy__": sympy.srepr(x)}
    # objects with plain __dict__ (inference methods, normalizers, ...)
    if hasattr(x, "__dict__") and type(x).__module__.startswith("gpy_tpu"):
        return {"__obj__": _classpath(x), "dict": {k: _enc(v, memo) for k, v in x.__dict__.items() if k not in _SKIP_KEYS}}
    raise TypeError(f"cannot serialize {type(x)!r}")


def _dec(x: Any, memo: dict | None = None) -> Any:
    if memo is None:
        memo = {}
    if isinstance(x, dict):
        if "__modref__" in x:
            return memo[x["__modref__"]]
        if "__module__" in x:
            cls = _resolve(x["__module__"])
            obj = object.__new__(cls)
            if "id" in x:
                memo[x["id"]] = obj
            obj.__dict__.update({k: _dec(v, memo) for k, v in x["dict"].items()})
            rebuild = getattr(obj, "_rebuild_after_load", None)
            if rebuild is not None:
                rebuild()
            return obj
        if "__paramspec__" in x:
            return ParamSpec(_dec(x["transform"], memo), _dec(x["prior"], memo), x["fixed"])
        if "__obj__" in x:
            cls = _resolve(x["__obj__"])
            obj = object.__new__(cls)
            obj.__dict__.update({k: _dec(v, memo) for k, v in x["dict"].items()})
            rebuild = getattr(obj, "_rebuild_after_load", None)
            if rebuild is not None:
                rebuild()
            return obj
        if "__array__" in x:
            return jnp.asarray(np.asarray(x["__array__"], dtype=x["dtype"]).reshape(x["shape"]))
        if "__dict__" in x:
            return {k: _dec(v, memo) for k, v in x["__dict__"].items()}
        if "__seq__" in x:
            seq = [_dec(v, memo) for v in x["__seq__"]]
            return tuple(seq) if x["tuple"] else seq
        if "__slice__" in x:
            return slice(*x["__slice__"])
        if "__sympy__" in x:
            import sympy

            return sympy.sympify(x["__sympy__"])
    return x


def to_dict(module: Module) -> dict:
    d = _enc(module)
    if isinstance(module, Module):
        # ties are root-level (shared TieGroup objects don't survive the
        # per-spec JSON encoding): record path groups, re-tie on load
        groups = {}
        for path, mod, n in module.named_params():
            tie = getattr(mod._specs[n], "tie", None)
            if tie is not None:
                groups[tie.leader_path] = [tie.leader_path,
                                           *tie.follower_paths]
        if groups:
            d["__ties__"] = [groups[k] for k in sorted(groups)]
    return d


def from_dict(d: dict) -> Module:
    ties = d.get("__ties__") if isinstance(d, dict) else None
    obj = _dec(d)
    # re-init ephemeral caches
    for m in obj.modules() if isinstance(obj, Module) else []:
        m.__dict__.setdefault("_version", 0)
    if ties and isinstance(obj, Module):
        for paths in ties:
            obj.tie(*paths)
    return obj


def save_model(model: Module, path: str, compress: bool = True):
    """GPy: m.save_model(path) — gzip JSON."""
    data = json.dumps(to_dict(model)).encode()
    if compress or path.endswith(".gz"):
        if not path.endswith((".gz", ".zip")):
            path = path + (".zip" if path.endswith(".json") else ".gz")
        with gzip.open(path, "wb") as f:
            f.write(data)
    else:
        with open(path, "wb") as f:
            f.write(data)
    return path


def load_model(path: str) -> Module:
    """GPy: GPy.load(path). Tolerates the missing .gz/.zip suffix that
    save_model appends when given a bare path."""
    import os

    if not os.path.exists(path):
        for ext in (".gz", ".zip", ".json.gz"):
            if os.path.exists(path + ext):
                path = path + ext
                break
    try:
        with gzip.open(path, "rb") as f:
            data = f.read()
    except (gzip.BadGzipFile, OSError):
        with open(path, "rb") as f:
            data = f.read()
    return from_dict(json.loads(data.decode()))
