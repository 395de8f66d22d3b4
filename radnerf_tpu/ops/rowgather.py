"""Row-gather helper with PROMISE_IN_BOUNDS semantics.

``jnp.take`` defaults to FILL mode: XLA lowers it as clamp -> gather ->
per-row bounds SELECT against the fill value. That select is a full extra
pass over every gathered tensor — profiled at ~20 x 246 us/frame on the
encoder level fetches alone of one 512x512 render frame (round 4). Every
hot-path index in this codebase is in-bounds BY CONSTRUCTION (clipped,
modded, or min'ed before the fetch), so the bounds machinery is pure waste.

Use :func:`take_rows` for any hot axis-0 row fetch whose indices are
provably in range; keep plain ``jnp.take`` where out-of-range indices can
occur and NaN-fill is the intended behavior.
"""

from __future__ import annotations

import jax


def take_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """``table[idx]`` along axis 0 with no clamp and no fill-select pass.

    Out-of-bounds indices are undefined behavior (the XLA
    PROMISE_IN_BOUNDS contract) — callers must guarantee
    ``0 <= idx < table.shape[0]``.
    """
    return table.at[idx].get(mode="promise_in_bounds")
