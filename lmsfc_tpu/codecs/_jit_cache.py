"""Shared jit-cache + mesh-sharding plumbing for the learned codecs.

Every learned codec builds a family of cached jitted programs with the same
layout convention: the param tree replicated, every data argument and every
output sharded on the dp (frame/GOP) mesh axis. One mixin so the
boilerplate — and any future change to the layout — has a single source.
"""

from __future__ import annotations

import jax


class MeshJitCache:
    """Requires `self.mesh` (or None) and `self._jit_cache: dict`,
    both set by the codec's __init__."""

    def _shardings(self):
        if self.mesh is None:
            return {}
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(self.mesh, P())
        dp = NamedSharding(self.mesh, P("dp"))
        return {"repl": repl, "dp": dp}

    def _dp_put(self, x):
        """Commit an array to the dp sharding (identity without a mesh) —
        fresh zeros and strided slices of sharded arrays don't inherit it,
        and strict in_shardings reject mismatched committed args."""
        sh = self._shardings()
        return jax.device_put(x, sh["dp"]) if sh else x

    def _cached_jit(self, key, fn, arity: int, repl_args: int = 1, layout=None):
        """jit with the codec's standard mesh layout: the first repl_args
        arguments (the param tree) replicated, the rest sharded on dp,
        outputs dp. `layout` overrides the prefix convention with an explicit
        per-argument mask — a string of 'r' (replicated) / 'd' (dp-sharded),
        e.g. "rdddr" for a replicated trailing scalar (ADVICE r2 #4)."""
        if key not in self._jit_cache:
            sh = self._shardings()
            if sh:
                if layout is not None:
                    assert len(layout) == arity, (layout, arity)
                    in_sh = tuple(
                        sh["repl"] if c == "r" else sh["dp"] for c in layout
                    )
                else:
                    in_sh = (sh["repl"],) * repl_args + (sh["dp"],) * (
                        arity - repl_args
                    )
                fn = jax.jit(fn, in_shardings=in_sh, out_shardings=sh["dp"])
            else:
                fn = jax.jit(fn)
            self._jit_cache[key] = fn
        return self._jit_cache[key]
