"""Frame-to-frame particle linking via optimal assignment.

Parity target: ``link_particles`` (helpers/helpersTracking.py:123-178) —
dense pairwise Euclidean cost, Hungarian assignment
(``scipy.optimize.linear_sum_assignment``), post-filter by ``max_distance``.

Detection counts per frame are tiny (tens), so the assignment runs on host
(scipy); the dense distance matrix is vectorized numpy. A pure-numpy
auction fallback handles environments without scipy.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def _assignment(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    try:
        from scipy.optimize import linear_sum_assignment

        return linear_sum_assignment(cost)
    except ImportError:  # pragma: no cover - greedy fallback
        n0, n1 = cost.shape
        rows, cols = [], []
        used0, used1 = set(), set()
        for idx in np.argsort(cost, axis=None):
            i, j = divmod(int(idx), n1)
            if i not in used0 and j not in used1:
                rows.append(i)
                cols.append(j)
                used0.add(i)
                used1.add(j)
            if len(rows) == min(n0, n1):
                break
        return np.asarray(rows), np.asarray(cols)


def link_particles(
    coords_t0: np.ndarray, coords_t1: np.ndarray, max_distance: float = 15.0
) -> Tuple[List[Tuple[int, int]], List[int], List[int]]:
    """Returns ``(links [(i0, i1)...], unlinked_t0, unlinked_t1)``."""
    coords_t0 = np.asarray(coords_t0, np.float64).reshape(-1, 2)
    coords_t1 = np.asarray(coords_t1, np.float64).reshape(-1, 2)
    if len(coords_t0) == 0 or len(coords_t1) == 0:
        return [], list(range(len(coords_t0))), list(range(len(coords_t1)))

    diff = coords_t0[:, None, :] - coords_t1[None, :, :]
    cost = np.sqrt((diff**2).sum(-1))
    rows, cols = _assignment(cost)

    links = []
    unlinked_t0 = list(range(len(coords_t0)))
    unlinked_t1 = list(range(len(coords_t1)))
    for i, j in zip(rows, cols):
        if cost[i, j] <= max_distance:
            links.append((int(i), int(j)))
            unlinked_t0.remove(int(i))
            unlinked_t1.remove(int(j))
    return links, unlinked_t0, unlinked_t1
