"""Parameter tree: the TPU-native replacement for paramz.

GPy delegates its whole parameter runtime to the external `paramz` package
(reference: GPy/core/model.py:4-6, GPy/core/parameterization/param.py:9-10):
named parameter trees, constraint transforms, observer cascades that re-run
inference on every mutation, LRU caching, and gradient chain-ruling back to
optimizer space.

Here none of that machinery is needed: a model is a tree of `Module`s whose
parameters are stored as *unconstrained raw arrays*; the loss is a pure
function of those raws (constraints applied inside via bijectors, see
transformations.py), and `jax.value_and_grad` of that pure function replaces
the observer/update_gradients economy entirely. `Cache_this` disappears under
jit (XLA CSE); `ObsAr` disappears because nothing observes anything.

The user-facing ergonomics mirror GPy/paramz:

    m.rbf.lengthscale = 2.0
    m.rbf.variance.fix()
    m.likelihood.variance.constrain_bounded(1e-3, 10.)
    m.rbf.lengthscale.set_prior(Gamma(2., 1.))
    print(m)
"""
from __future__ import annotations

import copy
from typing import Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import default_dtype
from .transformations import Logexp, Logistic, Transform

__all__ = ["Module", "Param", "ParamSpec", "TieGroup"]


class ParamSpec:
    """Metadata for one parameter: constraint transform, prior, fixed flag,
    optional tie group (paramz tie parity: tied params share one value and
    one optimizer slot)."""

    __slots__ = ("transform", "prior", "fixed", "tie")

    def __init__(self, transform: Optional[Transform] = None, prior=None,
                 fixed: bool = False, tie=None):
        self.transform = transform
        self.prior = prior
        self.fixed = fixed
        self.tie = tie

    def __getstate__(self):
        return (self.transform, self.prior, self.fixed, self.tie)

    def __setstate__(self, s):
        self.transform, self.prior, self.fixed = s[0], s[1], s[2]
        self.tie = s[3] if len(s) > 3 else None


class TieGroup:
    """Equivalence class of parameters sharing one value (paramz tie).

    leader_path/follower_paths are dotted paths FROM THE MODULE tie() was
    called on (normally the model root): the flat optimizer vector carries
    only the leader; every flat round-trip writes the leader's block into
    all members. `members` additionally holds (module, name) handles from
    declaration time so eager assignment through __setattr__/set_value
    propagates immediately on the declaring model object.
    """

    __slots__ = ("leader_path", "follower_paths", "members")

    def __init__(self, paths, members):
        self.leader_path = paths[0]
        self.follower_paths = tuple(paths[1:])
        self.members = list(members)

    def __getstate__(self):
        return (self.leader_path, self.follower_paths, self.members)

    def __setstate__(self, s):
        self.leader_path, self.follower_paths, self.members = s


class Param:
    """Handle to one parameter of a Module.

    Numerically behaves as its *constrained* value (via __jax_array__ and
    operator overloads), while carrying the GPy-style mutation API
    (fix/constrain/set_prior). Mirrors paramz.Param without subclassing
    ndarray.
    """

    __slots__ = ("_module", "_name")

    def __init__(self, module: "Module", name: str):
        object.__setattr__(self, "_module", module)
        object.__setattr__(self, "_name", name)

    # --- value access -----------------------------------------------------
    @property
    def spec(self) -> ParamSpec:
        return self._module._specs[self._name]

    @property
    def raw(self):
        return self._module._raw[self._name]

    @property
    def values(self):
        spec = self.spec
        r = self._module._raw[self._name]
        return spec.transform.forward(r) if spec.transform is not None else r

    def __jax_array__(self):
        return jnp.asarray(self.values)

    def __array__(self, dtype=None):
        v = np.asarray(self.values)
        return v.astype(dtype) if dtype is not None else v

    @property
    def shape(self):
        return self.raw.shape

    @property
    def size(self):
        return int(np.prod(self.raw.shape)) if self.raw.ndim else 1

    @property
    def ndim(self):
        return self.raw.ndim

    @property
    def dtype(self):
        return self.raw.dtype

    # --- GPy-style mutation API ------------------------------------------
    def set_value(self, value):
        self._module._set_param(self._name, value)

    def fix(self, value=None):
        if value is not None:
            self.set_value(value)
        self._set_fixed(True)
        self._module._bump_version()
        return self

    constrain_fixed = fix

    def unfix(self):
        self._set_fixed(False)
        self._module._bump_version()
        return self

    def _set_fixed(self, flag):
        # a tie group shares ONE value/optimizer slot: fixing any member
        # fixes the group (else the group silently vanished from the flat
        # vector when only the leader was fixed)
        self.spec.fixed = flag
        tie = self.spec.tie
        if tie is not None:
            for mod, n in tie.members:
                mod._specs[n].fixed = flag

    unconstrain_fixed = unfix

    def constrain(self, transform: Transform):
        v = self.values
        self.spec.transform = transform
        self._module._raw[self._name] = jnp.asarray(transform.inverse(v))
        self._module._bump_version()
        return self

    def constrain_positive(self):
        return self.constrain(Logexp())

    def constrain_bounded(self, lower, upper):
        return self.constrain(Logistic(lower, upper))

    def unconstrain(self):
        v = self.values
        self.spec.transform = None
        self._module._raw[self._name] = jnp.asarray(v)
        self._module._bump_version()
        return self

    def set_prior(self, prior):
        self.spec.prior = prior
        self._module._bump_version()
        return self

    def randomize(self, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        spec = self.spec
        v = rng.standard_normal(self.shape)
        if spec.transform is not None and spec.transform.domain == "positive":
            v = np.exp(v * 0.5)
        elif spec.transform is not None and spec.transform.domain == "bounded":
            t = spec.transform
            v = t.lower + (t.upper - t.lower) / (1 + np.exp(-v))
        self.set_value(jnp.asarray(v, dtype=self.dtype))
        return self

    # --- numeric protocol -------------------------------------------------
    def __getitem__(self, idx):
        return self.values[idx]

    def __len__(self):
        return self.raw.shape[0]

    def __iter__(self):
        return iter(np.asarray(self.values))

    def __float__(self):
        return float(np.asarray(self.values))

    def astype(self, dt):
        return jnp.asarray(self.values).astype(dt)

    def sum(self, *a, **k):
        return jnp.asarray(self.values).sum(*a, **k)

    def reshape(self, *s):
        return jnp.asarray(self.values).reshape(*s)

    def __repr__(self):
        return f"Param({self._name}={np.asarray(self.values)!r})"

    def __str__(self):
        return str(np.asarray(self.values))


def _binop(op, swap=False):
    def fn(self, other):
        a = jnp.asarray(self.values)
        b = jnp.asarray(other.values) if isinstance(other, Param) else other
        return op(b, a) if swap else op(a, b)

    return fn


import operator as _op

for _name, _o in [
    ("add", _op.add), ("sub", _op.sub), ("mul", _op.mul),
    ("truediv", _op.truediv), ("pow", _op.pow), ("matmul", _op.matmul),
    ("lt", _op.lt), ("le", _op.le), ("gt", _op.gt), ("ge", _op.ge),
]:
    setattr(Param, f"__{_name}__", _binop(_o))
    setattr(Param, f"__r{_name}__", _binop(_o, swap=True))
Param.__neg__ = lambda self: -jnp.asarray(self.values)


class Module:
    """A node in the parameter tree. Subclasses call `_add_param` in __init__.

    Child Modules are auto-registered on attribute assignment (including
    lists of Modules, used by Sum/Prod kernels).
    """

    def __init__(self, name: Optional[str] = None):
        d = object.__getattribute__(self, "__dict__")
        d["_specs"] = {}
        d["_raw"] = {}
        d["_children"] = {}
        d["_version"] = 0
        d["name"] = name or self.__class__.__name__.lower()

    # --- registration -----------------------------------------------------
    def _add_param(self, name, value, transform=None, prior=None, fixed=False, dtype=None):
        value = jnp.asarray(value, dtype=dtype or default_dtype())
        raw = jnp.asarray(transform.inverse(value)) if transform is not None else value
        self._specs[name] = ParamSpec(transform, prior, fixed)
        self._raw[name] = raw
        return Param(self, name)

    def _set_param(self, name, value):
        spec = self._specs[name]
        cur = self._raw[name]
        value = jnp.broadcast_to(jnp.asarray(value, dtype=cur.dtype), cur.shape)
        self._raw[name] = (
            jnp.asarray(spec.transform.inverse(value)) if spec.transform is not None else value
        )
        if spec.tie is not None:
            # eager write-through to every tied member (declaration-time
            # handles; flat round-trips enforce ties path-wise regardless)
            for m2, n2 in spec.tie.members:
                m2._raw[n2] = self._raw[name]

    def _bump_version(self):
        self.__dict__["_version"] = self.__dict__.get("_version", 0) + 1

    # --- attribute magic --------------------------------------------------
    def __setattr__(self, key, val):
        d = self.__dict__
        specs = d.get("_specs")
        if specs is not None and key in specs:
            self._set_param(key, val)
            return
        if not key.startswith("_") and d.get("_children") is not None:
            if isinstance(val, Module):
                d["_children"][key] = val
            elif isinstance(val, (list, tuple)) and len(val) > 0 and all(
                isinstance(x, Module) for x in val
            ):
                # drop any previously registered children under this key
                for k in [k for k in d["_children"] if k.startswith(key + "#")]:
                    del d["_children"][k]
                for i, m in enumerate(val):
                    d["_children"][f"{key}#{i}"] = m
        object.__setattr__(self, key, val)

    def __getattr__(self, key):
        d = object.__getattribute__(self, "__dict__")
        specs = d.get("_specs")
        if specs is not None and key in specs:
            return Param(self, key)
        children = d.get("_children")
        if children is not None and key in children:
            return children[key]
        raise AttributeError(f"{type(self).__name__!r} object has no attribute {key!r}")

    # --- traversal --------------------------------------------------------
    def named_params(self, prefix: str = "") -> Iterator[Tuple[str, "Module", str]]:
        for n in self._specs:
            yield (prefix + n, self, n)
        for cn, ch in self._children.items():
            yield from ch.named_params(prefix + cn + ".")

    def modules(self) -> Iterator["Module"]:
        yield self
        for ch in self._children.values():
            yield from ch.modules()

    # --- hierarchy-broadcast constraint ops (GPy/paramz Parameterized:
    # m.kern.fix(), m.likelihood.constrain_positive(), ... apply to every
    # parameter in the subtree) ---------------------------------------------
    def _params(self) -> Iterator["Param"]:
        for _, mod, n in self.named_params():
            yield Param(mod, n)

    def fix(self, value=None):
        for p in self._params():
            p.fix(value)
        return self

    constrain_fixed = fix

    def unfix(self):
        for p in self._params():
            p.unfix()
        return self

    unconstrain_fixed = unfix

    def constrain_positive(self):
        for p in self._params():
            p.constrain_positive()
        return self

    def constrain_bounded(self, lower, upper):
        for p in self._params():
            p.constrain_bounded(lower, upper)
        return self

    def unconstrain(self):
        for p in self._params():
            p.unconstrain()
        return self

    def set_prior(self, prior):
        for p in self._params():
            p.set_prior(prior)
        return self

    # --- parameter tying (paramz tie parity; SURVEY layer 0) --------------
    def tie(self, *paths):
        """Tie parameters so they share one value and one optimizer slot.

        paths are dotted parameter paths from THIS module (normally the
        model root), e.g. m.tie("kern.rbf.lengthscale",
        "kern.rbf_1.lengthscale"). The first path is the leader: the flat
        optimizer vector carries only its block, every flat round-trip
        (optimize, checkgrad, HMC) writes it into all members, and eager
        assignment to any member propagates immediately. Shapes must match.
        paramz equivalent: Param.tie_together / the ties parameterization.
        """
        assert len(paths) >= 2, "tie needs at least two parameter paths"
        entries = {path: (mod, n) for path, mod, n in self.named_params()}
        mems = []
        for p in paths:
            if p not in entries:
                raise KeyError(f"no parameter at path {p!r}")
            mod, n = entries[p]
            if mod._specs[n].tie is not None:
                raise ValueError(f"{p!r} is already tied; untie first")
            mems.append((mod, n))
        shp = mems[0][0]._raw[mems[0][1]].shape
        lead_t = mems[0][0]._specs[mems[0][1]].transform
        for (mod, n), p in zip(mems, paths):
            if mod._raw[n].shape != shp:
                raise ValueError(
                    f"tied shapes differ: {p!r} has {mod._raw[n].shape}, "
                    f"leader has {shp}")
            t = mod._specs[n].transform
            # ties share RAW values, so members must map raw->constrained
            # identically; otherwise constrained values silently diverge
            if type(t) is not type(lead_t) or getattr(t, "__dict__", {}) != getattr(lead_t, "__dict__", {}):
                raise ValueError(
                    f"tied transforms differ: {p!r} has {t!r}, leader has "
                    f"{lead_t!r}; constrain members identically before tying")
        group = TieGroup(list(paths), mems)
        lead_raw = mems[0][0]._raw[mems[0][1]]
        # fixing any member means fixing the shared value: unify the flag
        any_fixed = any(mod._specs[n].fixed for mod, n in mems)
        for mod, n in mems:
            spec = mod._specs[n]
            mod._specs[n] = ParamSpec(spec.transform, spec.prior, any_fixed,
                                      tie=group)
            mod._raw[n] = lead_raw
        self._bump_version()
        return self

    def untie(self, *paths):
        """Remove any tie groups containing the given paths (all members
        of each group are released). With no arguments, unties everything."""
        targets = set(paths)
        for path, mod, n in self.named_params():
            tie = mod._specs[n].tie
            if tie is None:
                continue
            if not targets or path in targets or tie.leader_path in targets:
                for m2, n2 in tie.members:
                    sp = m2._specs[n2]
                    if sp.tie is tie:
                        m2._specs[n2] = ParamSpec(sp.transform, sp.prior,
                                                  sp.fixed)
        self._bump_version()
        return self

    def _sync_ties(self):
        """Copy each tie leader's raw value onto its followers (path-wise,
        so it works on any copy of the tree)."""
        raws = {}
        for path, mod, n in self.named_params():
            tie = mod._specs[n].tie
            if tie is not None and path == tie.leader_path:
                raws[id(tie)] = mod._raw[n]
        for path, mod, n in self.named_params():
            tie = mod._specs[n].tie
            if tie is not None and path in tie.follower_paths and id(tie) in raws:
                mod._raw[n] = raws[id(tie)]
        return self

    def structure_version(self) -> int:
        return sum(m.__dict__.get("_version", 0) for m in self.modules())

    # --- raw-dict plumbing (the pytree surface) ---------------------------
    def get_raw_dict(self, free_only: bool = False) -> dict:
        out = {}
        for path, mod, n in self.named_params():
            if free_only and mod._specs[n].fixed:
                continue
            out[path] = mod._raw[n]
        return out

    def set_raw_dict(self, d: dict):
        for path, mod, n in self.named_params():
            if path in d:
                mod._raw[n] = d[path]

    def with_raw_dict(self, d: dict) -> "Module":
        """Functional copy with (a subset of) raw values replaced.

        This is the jit boundary: `model.with_raw_dict(tracers).objective()`
        traces the whole loss as a pure function of the raw values.
        """
        return self._fcopy(d, "")

    def _fcopy(self, raw_map: dict, prefix: str) -> "Module":
        new = object.__new__(type(self))
        new.__dict__.update(self.__dict__)
        new.__dict__["_specs"] = dict(self._specs)
        new.__dict__["_raw"] = {
            n: raw_map.get(prefix + n, r) for n, r in self._raw.items()
        }
        new_children = {}
        for cn, ch in self._children.items():
            chc = ch._fcopy(raw_map, prefix + cn + ".")
            new_children[cn] = chc
            if self.__dict__.get(cn) is ch:
                new.__dict__[cn] = chc
        new.__dict__["_children"] = new_children
        # fix up list-of-module attributes (Sum/Prod parts)
        for k, v in self.__dict__.items():
            if (
                isinstance(v, (list, tuple))
                and len(v) > 0
                and all(isinstance(x, Module) for x in v)
                and f"{k}#0" in new_children
            ):
                new.__dict__[k] = type(v)(
                    new_children[f"{k}#{i}"] for i in range(len(v))
                )
        return new

    def copy(self) -> "Module":
        return copy.deepcopy(self)

    def stop_gradient(self) -> "Module":
        """Functional copy whose raw values are lax.stop_gradient'd.

        Used by fixed-point inference (Laplace/EP) to run non-differentiable
        convergence loops before a final differentiable step."""
        import jax.lax as lax

        return self.with_raw_dict(
            {p: lax.stop_gradient(mod._raw[n]) for p, mod, n in self.named_params()}
        )

    # --- flat vector interface (optimizer space) --------------------------
    def _free_entries(self):
        return [
            (path, mod, n)
            for path, mod, n in self.named_params()
            if not mod._specs[n].fixed
            and not (mod._specs[n].tie is not None
                     and path in mod._specs[n].tie.follower_paths)
        ]

    @property
    def num_free_params(self) -> int:
        return sum(int(np.prod(mod._raw[n].shape)) for _, mod, n in self._free_entries())

    def get_flat_raw(self) -> jax.Array:
        entries = self._free_entries()
        if not entries:
            return jnp.zeros((0,), dtype=default_dtype())
        return jnp.concatenate([mod._raw[n].reshape(-1) for _, mod, n in entries])

    def flat_to_raw_dict(self, flat) -> dict:
        out = {}
        i = 0
        groups = []
        for path, mod, n in self._free_entries():
            shp = mod._raw[n].shape
            sz = int(np.prod(shp))
            out[path] = flat[i : i + sz].reshape(shp)
            i += sz
            tie = mod._specs[n].tie
            if tie is not None and path == tie.leader_path:
                groups.append(tie)
        # ties: the leader's block is every member's value
        for tie in groups:
            for f in tie.follower_paths:
                out[f] = out[tie.leader_path]
        return out

    def set_flat_raw(self, flat):
        self.set_raw_dict(self.flat_to_raw_dict(jnp.asarray(flat)))

    def with_flat_raw(self, flat) -> "Module":
        return self.with_raw_dict(self.flat_to_raw_dict(flat))

    # GPy compat: values of all params in constrained space
    @property
    def param_array(self) -> np.ndarray:
        vals = []
        for path, mod, n in self.named_params():
            spec = mod._specs[n]
            r = mod._raw[n]
            v = spec.transform.forward(r) if spec.transform is not None else r
            vals.append(np.asarray(v).reshape(-1))
        return np.concatenate(vals) if vals else np.zeros((0,))

    @property
    def optimizer_array(self) -> np.ndarray:
        return np.asarray(self.get_flat_raw())

    # --- priors -----------------------------------------------------------
    def log_prior(self):
        total = jnp.asarray(0.0, dtype=default_dtype())
        for path, mod, n in self.named_params():
            spec = mod._specs[n]
            if spec.prior is None:
                continue
            r = mod._raw[n]
            v = spec.transform.forward(r) if spec.transform is not None else r
            total = total + jnp.sum(spec.prior.lnpdf(v))
        return total

    def randomize(self, rng: Optional[np.random.Generator] = None):
        """GPy: m.randomize() — used by every gradient-check test."""
        rng = rng or np.random.default_rng()
        for path, mod, n in self._free_entries():
            Param(mod, n).randomize(rng)
        self._sync_ties()
        return self

    # --- printing ---------------------------------------------------------
    def __str__(self):
        rows = []
        for path, mod, n in self.named_params():
            spec = mod._specs[n]
            v = np.asarray(Param(mod, n).values)
            vstr = f"{v:.6g}" if v.ndim == 0 else f"({', '.join(f'{x:.4g}' for x in v.reshape(-1)[:6])}{', ...' if v.size > 6 else ''})"
            cons = "fixed" if spec.fixed else (str(spec.transform) if spec.transform else "")
            if spec.tie is not None:
                cons = (cons + " " if cons else "") + (
                    "tied" if path == spec.tie.leader_path
                    else f"tied:{spec.tie.leader_path}")
            prior = type(spec.prior).__name__ if spec.prior is not None else ""
            rows.append((f"{self.name}.{path}", vstr, cons, prior))
        if not rows:
            return f"<{type(self).__name__} {self.name} (no params)>"
        w0 = max(len(r[0]) for r in rows + [("name", "", "", "")])
        w1 = max(len(r[1]) for r in rows + [("", "value", "", "")])
        w2 = max(len(r[2]) for r in rows + [("", "", "constraints", "")])
        lines = [f"{'name':<{w0}}  |  {'value':>{w1}}  |  {'constraints':>{w2}}  |  priors"]
        for r in rows:
            lines.append(f"{r[0]:<{w0}}  |  {r[1]:>{w1}}  |  {r[2]:>{w2}}  |  {r[3]}")
        return "\n".join(lines)

    def __repr__(self):
        return f"<{type(self).__name__} '{self.name}': {len(list(self.named_params()))} params>"
