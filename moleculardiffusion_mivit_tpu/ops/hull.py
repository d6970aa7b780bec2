"""Convex hull area for small point sets, jit/vmap-safe.

Replaces ``scipy.spatial.ConvexHull(points).volume`` (the hull-area feature,
helpers/helpersFeatures.py:381-402) with a fixed-step Jarvis gift wrap: at
most ``n`` wrap steps, each picking the most counter-clockwise point via
vectorized cross-product tests — O(n²) total, ideal for the ≤ 60-point
trajectories this feature sees. Degenerate sets (all points collinear or
coincident) yield area 0, matching the reference's exception fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def convex_hull_area(points: jax.Array) -> jax.Array:
    """Area of the convex hull of ``points (n, 2)`` via gift wrapping +
    shoelace accumulation."""
    pts = jnp.asarray(points, jnp.float32)
    n = pts.shape[0]

    # Start at the lowest-y (then lowest-x) point — guaranteed on the hull.
    order = jnp.lexsort((pts[:, 0], pts[:, 1]))
    start = order[0]

    def next_on_hull(current):
        """Most clockwise... pick candidate q such that every other point is
        to the right of (or on) the line current→q."""
        c = pts[current]

        def better(q_idx, r_idx):
            # returns True if r is more counter-clockwise than q w.r.t. c
            q = pts[q_idx]
            r = pts[r_idx]
            cross = (q[0] - c[0]) * (r[1] - c[1]) - (q[1] - c[1]) * (r[0] - c[0])
            dq = jnp.sum((q - c) ** 2)
            dr = jnp.sum((r - c) ** 2)
            return (cross < 0) | ((cross == 0) & (dr > dq))

        def scan_body(best, idx):
            valid = idx != current
            take = valid & better(best, idx)
            return jnp.where(take, idx, best), None

        first = jnp.where(current == 0, 1, 0)
        best, _ = jax.lax.scan(scan_body, first, jnp.arange(n))
        return best

    def body(carry, _):
        current, done, area2 = carry
        nxt = next_on_hull(current)
        seg = pts[current, 0] * pts[nxt, 1] - pts[nxt, 0] * pts[current, 1]
        area2 = jnp.where(done, area2, area2 + seg)
        done = done | (nxt == start)
        return (nxt, done, area2), None

    (_, _, area2), _ = jax.lax.scan(
        body, (start, jnp.array(False), jnp.float32(0.0)), None, length=n
    )
    return jnp.abs(area2) / 2.0
