"""On-disk persistence for host-built routing plans (ROADMAP #6).

Route/pair plans cost seconds of host time per structure (vectorised
NumPy + native coloring). Deployments that factor/multiply the same
sparsity across processes — and the bench harness itself — reload
them from disk keyed by a structure hash instead.

Storage: pickled plan objects with device arrays converted to NumPy
on save and re-committed with ``jax.ensure_compile_time_eval`` on
load (cached plans must hold committed constants, not trace-scoped
arrays — same contract as utils.plancache). Any load failure (missing
attribute after a refactor, version bump, corrupt file) silently
falls back to a rebuild; the cache is an optimisation, never a
correctness dependency.

Location: ``$SPALINALG_PLAN_CACHE`` (a directory; ``0``/``off``
disables), default ``~/.cache/spalinalg_tpu/plans``.
"""

from __future__ import annotations

import hashlib
import os
import pickle

import numpy as np

__all__ = ["plan_cache_dir", "load_or_build"]

_VERSION = 2  # bump when plan layouts or build algorithms change


def plan_cache_dir():
    env = os.environ.get("SPALINALG_PLAN_CACHE", "")
    if env.lower() in ("0", "off", "none"):
        return None
    path = env or os.path.expanduser("~/.cache/spalinalg_tpu/plans")
    try:
        os.makedirs(path, exist_ok=True)
        return path
    except OSError:
        return None


def _structure_key(kind: str, arrays, scalars) -> str:
    h = hashlib.sha256()
    h.update(f"{kind}:v{_VERSION}".encode())
    for s in scalars:
        h.update(str(s).encode())
        h.update(b";")
    for a in arrays:
        a = np.ascontiguousarray(a)
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        h.update(a.tobytes())
    return h.hexdigest()


def _to_host(obj, jax_fields, recurse):
    import jax.numpy as jnp  # noqa: F401

    for f in jax_fields:
        v = getattr(obj, f)
        if v is not None:
            object.__setattr__(obj, f, np.asarray(v))
    if getattr(obj, "_baked", None) is not None:
        object.__setattr__(obj, "_baked", None)  # per-values device cache
    for f in recurse:
        child = getattr(obj, f)
        if child is not None:
            _to_host(child, jax_fields, recurse)
    return obj


def _to_device(obj, jax_fields, recurse):
    import jax
    import jax.numpy as jnp

    with jax.ensure_compile_time_eval():
        for f in jax_fields:
            v = getattr(obj, f)
            if v is not None:
                object.__setattr__(obj, f, jnp.asarray(v))
        for f in recurse:
            child = getattr(obj, f)
            if child is not None:
                _to_device(child, jax_fields, recurse)
    return obj


def load_or_build(kind, arrays, scalars, build, jax_fields,
                  recurse=()):
    """Return the cached plan for this structure, or build+store it.

    ``arrays``/``scalars`` define the structure identity; ``build`` is
    the host builder; ``jax_fields`` are the attribute names holding
    device arrays (converted per the module contract); ``recurse``
    names child-plan attributes treated the same way.
    """
    cdir = plan_cache_dir()
    if cdir is None:
        return build()
    path = os.path.join(cdir, _structure_key(kind, arrays, scalars))
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                plan = pickle.load(f)
            return _to_device(plan, jax_fields, recurse)
        except Exception:
            pass  # corrupt / stale layout: rebuild below
    plan = build()
    try:
        host = _to_host(plan, jax_fields, recurse)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(host, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
    except Exception:
        pass
    return _to_device(plan, jax_fields, recurse)
