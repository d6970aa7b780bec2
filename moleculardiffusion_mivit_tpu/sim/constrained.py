"""Constrained diffusion simulators (mitochondria geometry).

Parity targets (Experiments/mitochondria_simulation/):

- ``Edge`` / ``Geometry`` with cumulative-length position lookup and
  ``map_displacements`` — 1-D diffusion along a connected piecewise-linear
  path, displacements clamped at the path ends (mitochnodria.py:37-380);
- ``disp_fbm`` — fractional Gaussian displacements scaled ``sqrt(2·D·dt)``
  (mitochnodria.py:436-475, via the ``fbm`` package's Davies-Harte);
- the old-version reflected simulation — fBm confined to (rotated)
  rectangles by per-step reflection (old_version/constrainedSim2.py:
  ``Shape.reflect``, ``traj_in_rectangles``).

TPU-native: the geometry is arrays (edge endpoints + cumulative lengths),
position lookup is a vectorized ``searchsorted`` + lerp, the sequential
clamp/reflect recursions are ``lax.scan``s vmapped over particles, and the
fGn comes from our circulant-embedding generator (no ``fbm`` dependency).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from moleculardiffusion_mivit_tpu.sim.trajectory import fractional_gaussian_noise


def disp_fbm(
    key: jax.Array, alpha: float, D: float, T: int, delta_t: float = 1.0, batch: int = 1
) -> jax.Array:
    """Fractional Gaussian displacements with ``<x²(dt)> = 2·D·dt``
    (mitochnodria.py:436-475). Returns ``(batch, T)``."""
    disp = fractional_gaussian_noise(key, jnp.float32(alpha) / 2.0, T, batch)
    return disp * jnp.sqrt(2.0 * D * delta_t)


class PiecewiseLinearGeometry:
    """A connected piecewise-linear path (the mitochondria skeleton).

    Construct from vertices ``[(x0, y0), (x1, y1), ...]``; consecutive
    vertices define connected edges (the reference validates connectivity,
    mitochnodria.py:151-176).
    """

    def __init__(self, vertices: Sequence[Tuple[float, float]]):
        v = np.asarray(vertices, np.float32)
        if v.ndim != 2 or v.shape[0] < 2 or v.shape[1] != 2:
            raise ValueError("need at least 2 (x, y) vertices")
        self.vertices = v
        seg = v[1:] - v[:-1]
        self.lengths = np.sqrt((seg**2).sum(-1))
        if np.any(self.lengths <= 0):
            raise ValueError("zero-length edge")
        self.cum_lengths = np.concatenate([[0.0], np.cumsum(self.lengths)]).astype(np.float32)
        self.total_length = float(self.cum_lengths[-1])

    @property
    def n_edges(self) -> int:
        return len(self.lengths)

    def position_at_distance(self, distance) -> jax.Array:
        """Vectorized 1-D arclength → 2-D position (lerp on the owning edge);
        distances are clamped into [0, total_length]."""
        d = jnp.clip(jnp.asarray(distance, jnp.float32), 0.0, self.total_length)
        cum = jnp.asarray(self.cum_lengths)
        edge = jnp.clip(jnp.searchsorted(cum, d, side="right") - 1, 0, self.n_edges - 1)
        t = (d - cum[edge]) / jnp.asarray(self.lengths)[edge]
        v = jnp.asarray(self.vertices)
        return v[edge] + t[..., None] * (v[edge + 1] - v[edge])

    def map_displacements(self, displacements: jax.Array, initial_distance: float = 0.0):
        """Per-step clamped cumulative walk along the path → 2-D positions
        (mitochnodria.py:339-380). ``displacements``: (T,) or (B, T)."""
        disp = jnp.atleast_2d(jnp.asarray(displacements, jnp.float32))
        start = jnp.clip(jnp.float32(initial_distance), 0.0, self.total_length)

        def step(carry, d):
            new = jnp.clip(carry + d, 0.0, self.total_length)
            return new, new

        def walk(one):
            _, dists = jax.lax.scan(step, start, one)
            return dists

        dists = jax.vmap(walk)(disp)  # (B, T)
        pos = self.position_at_distance(dists)
        return pos if displacements.ndim > 1 else pos[0]

    def simulate(
        self,
        key: jax.Array,
        n_particles: int,
        T: int,
        D: float,
        alpha: float = 1.0,
        delta_t: float = 1.0,
        initial_distance: float = 0.0,
    ) -> jax.Array:
        """fBm along the geometry: ``(n_particles, T, 2)`` positions."""
        disp = disp_fbm(key, alpha, D, T, delta_t, n_particles)
        return self.map_displacements(disp, initial_distance)


def _reflect_into(x, low, high):
    """Fold a coordinate into [low, high] by reflection (triangle wave)."""
    span = high - low
    y = jnp.mod(x - low, 2.0 * span)
    return low + span - jnp.abs(y - span)


@functools.partial(jax.jit, static_argnames=("n_particles", "T"))
def reflected_rectangle_trajectories(
    key: jax.Array,
    n_particles: int,
    T: int,
    rect_center: Tuple[float, float],
    rect_size: Tuple[float, float],
    angle: float = 0.0,
    D: float = 1.0,
    alpha: float = 1.0,
    delta_t: float = 1.0,
) -> jax.Array:
    """fBm confined to a rotated rectangle by per-step reflection
    (old_version/constrainedSim2.py). Particles start at the rectangle
    center. Returns ``(n_particles, T, 2)`` lab-frame positions."""
    kx, ky = jax.random.split(key)
    dx = disp_fbm(kx, alpha, D, T, delta_t, n_particles)
    dy = disp_fbm(ky, alpha, D, T, delta_t, n_particles)
    w, h = rect_size
    half = jnp.array([w / 2.0, h / 2.0], jnp.float32)

    def step(pos, d):
        new = pos + d
        new = jnp.stack(
            [
                _reflect_into(new[0], -half[0], half[0]),
                _reflect_into(new[1], -half[1], half[1]),
            ]
        )
        return new, new

    def walk(dxy):
        _, pos = jax.lax.scan(step, jnp.zeros(2, jnp.float32), dxy)
        return pos

    local = jax.vmap(walk)(jnp.stack([dx, dy], axis=-1))  # (B, T, 2)
    c, s = jnp.cos(angle), jnp.sin(angle)
    rot = jnp.array([[c, -s], [s, c]], jnp.float32)
    center = jnp.asarray(rect_center, jnp.float32)
    return local @ rot.T + center
