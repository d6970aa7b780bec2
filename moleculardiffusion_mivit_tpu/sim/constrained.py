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

from moleculardiffusion_mivit_tpu.sim.trajectory import (
    fractional_gaussian_noise,
    reflect_into_box,
)


def disp_fbm(
    key: jax.Array, alpha: float, D: float, T: int, delta_t: float = 1.0, batch: int = 1
) -> jax.Array:
    """Fractional Gaussian displacements with ``<x²(dt)> = 2·D·dt``
    (mitochnodria.py:436-475). Returns ``(batch, T)``."""
    disp = fractional_gaussian_noise(key, jnp.float32(alpha) / 2.0, T, batch)
    return disp * jnp.sqrt(2.0 * D * delta_t)


class Edge:
    """One line segment of the skeleton (mitochnodria.py:37-123).

    Exposes the reference Edge's query surface — ``length``, ``angle``,
    ``start_point`` / ``end_point``, ``get_position_at_distance`` (clamped
    lerp), ``distance_to_end`` (projection onto the edge direction) — so
    edge-list-defined geometries port over directly.
    """

    def __init__(self, start_point: Tuple[float, float], end_point: Tuple[float, float]):
        self.start_point = np.asarray(start_point, np.float32)
        self.end_point = np.asarray(end_point, np.float32)
        self.vector = self.end_point - self.start_point
        self.length = float(np.linalg.norm(self.vector))
        if self.length <= 0:
            raise ValueError("zero-length edge")
        self.angle = float(np.arctan2(self.vector[1], self.vector[0]))

    def get_position_at_distance(self, distance: float) -> np.ndarray:
        d = min(max(float(distance), 0.0), self.length)
        return self.start_point + (d / self.length) * self.vector

    def distance_to_end(self, current_position) -> float:
        to_end = self.end_point - np.asarray(current_position, np.float32)
        return max(0.0, float(np.dot(to_end, self.vector / self.length)))

    def __repr__(self):
        return (
            f"Edge(start={tuple(self.start_point)}, end={tuple(self.end_point)}, "
            f"length={self.length:.2f})"
        )


class PiecewiseLinearGeometry:
    """A connected piecewise-linear path (the mitochondria skeleton).

    Construct from vertices ``[(x0, y0), (x1, y1), ...]`` — consecutive
    vertices define connected edges — or from an explicit edge list via
    ``from_edges`` with the reference's connectivity validation
    (mitochnodria.py:151-176: end point of edge ``i`` must equal the start
    point of edge ``i+1``, else ValueError).
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
        self.edges = [Edge(v[i], v[i + 1]) for i in range(len(v) - 1)]

    @classmethod
    def from_edges(cls, edges: Sequence) -> "PiecewiseLinearGeometry":
        """Build from a connected edge list (``Edge`` objects or
        ``((x0, y0), (x1, y1))`` pairs), validating connectivity exactly as
        the reference Geometry does (mitochnodria.py:151-176)."""
        if not edges:
            raise ValueError("need at least one edge")
        es = [e if isinstance(e, Edge) else Edge(*e) for e in edges]
        for i in range(len(es) - 1):
            if not np.allclose(es[i].end_point, es[i + 1].start_point):
                raise ValueError(
                    f"edge chain breaks between edges {i} and {i + 1}: "
                    f"{tuple(es[i].end_point)} != {tuple(es[i + 1].start_point)}"
                )
        vertices = [es[0].start_point] + [e.end_point for e in es]
        return cls(vertices)

    @property
    def n_edges(self) -> int:
        return len(self.lengths)

    @property
    def bounding_box(self) -> Tuple[float, float, float, float]:
        """(min_x, max_x, min_y, max_y) over all vertices
        (mitochnodria.py:178-201)."""
        return (
            float(self.vertices[:, 0].min()),
            float(self.vertices[:, 0].max()),
            float(self.vertices[:, 1].min()),
            float(self.vertices[:, 1].max()),
        )

    def get_edge_at_position(self, position, tol: float = 1e-10):
        """The edge whose segment contains ``position`` (spatial lookup), or
        None when the point lies on no edge (mitochnodria.py:199-230).

        Vectorized over edges: project the point onto every segment, accept
        edges whose projection parameter lies in [0, length] and whose
        perpendicular distance is below ``tol``; ties (shared vertices)
        resolve to the first edge in chain order, like the reference's loop.
        """
        pos = np.asarray(position, np.float64)
        starts = self.vertices[:-1].astype(np.float64)
        ends = self.vertices[1:].astype(np.float64)
        vecs = ends - starts
        lengths = np.asarray(self.lengths, np.float64)
        rel = pos[None, :] - starts
        proj = (rel * vecs).sum(axis=1) / lengths  # projection parameter
        perp = rel - (proj / lengths)[:, None] * vecs
        perp_dist = np.linalg.norm(perp, axis=1)
        ok = (proj >= 0.0) & (proj <= lengths) & (perp_dist < tol)
        hits = np.nonzero(ok)[0]
        return self.edges[int(hits[0])] if hits.size else None

    def get_edge_at_length(self, distance: float):
        """(edge, remaining distance along it) at an arclength from the
        start; (None, 0.0) outside [0, total_length]
        (mitochnodria.py:231-264)."""
        if distance < 0 or distance > self.total_length:
            return None, 0.0
        idx = int(np.clip(np.searchsorted(self.cum_lengths, distance, side="right") - 1,
                          0, self.n_edges - 1))
        return self.edges[idx], float(distance - self.cum_lengths[idx])

    def draw(self, ax=None, edge_color="blue", vertex_color="red", show_vertices=False):
        """Plot the skeleton (mitochnodria.py:267-327)."""
        import matplotlib.pyplot as plt

        if ax is None:
            _, ax = plt.subplots(figsize=(8, 6))
        for e in self.edges:
            ax.plot(
                [e.start_point[0], e.end_point[0]],
                [e.start_point[1], e.end_point[1]],
                color=edge_color,
                linewidth=1.5,
            )
        if show_vertices:
            ax.scatter(self.vertices[:, 0], self.vertices[:, 1], color=vertex_color, zorder=10)
        ax.set_aspect("equal")
        return ax

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
        pos = _walk_and_lerp(
            jnp.asarray(self.vertices),
            jnp.asarray(self.lengths),
            jnp.asarray(self.cum_lengths),
            disp,
            jnp.float32(initial_distance),
        )
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
        """fBm along the geometry: ``(n_particles, T, 2)`` positions.

        One jitted program (fGn → clamped arclength walk → edge lerp): the
        axon TPU tunnel mis-executes the eager op-by-op complex-FFT chain,
        and a single fused executable is also what the training pipeline
        wants anyway.
        """
        return _simulate_on_path(
            key,
            jnp.asarray(self.vertices),
            jnp.asarray(self.lengths),
            jnp.asarray(self.cum_lengths),
            n_particles,
            T,
            jnp.float32(D),
            jnp.float32(alpha),
            jnp.float32(delta_t),
            jnp.float32(initial_distance),
        )


def _walk_and_lerp(vertices, lengths, cum_lengths, disp, initial_distance):
    """Clamped cumulative arclength walk + edge lerp — the single source of
    truth for the path-walk semantics (mitochnodria.py:339-380): per-step
    clamp into [0, total_length], then ``side='right'`` searchsorted edge
    lookup and linear interpolation. ``disp``: (B, T) → positions (B, T, 2)."""
    total_length = cum_lengths[-1]
    start = jnp.clip(initial_distance, 0.0, total_length)

    def step(carry, d):
        new = jnp.clip(carry + d, 0.0, total_length)
        return new, new

    def walk(one):
        _, dists = jax.lax.scan(step, start, one)
        return dists

    dists = jax.vmap(walk)(disp)  # (B, T)
    n_edges = lengths.shape[0]
    edge = jnp.clip(jnp.searchsorted(cum_lengths, dists, side="right") - 1, 0, n_edges - 1)
    t = (dists - cum_lengths[edge]) / lengths[edge]
    return vertices[edge] + t[..., None] * (vertices[edge + 1] - vertices[edge])


@functools.partial(jax.jit, static_argnames=("n_particles", "T"))
def _simulate_on_path(
    key, vertices, lengths, cum_lengths, n_particles, T, D, alpha, delta_t, initial_distance
):
    disp = fractional_gaussian_noise(key, alpha / 2.0, T, n_particles) * jnp.sqrt(
        2.0 * D * delta_t
    )
    return _walk_and_lerp(vertices, lengths, cum_lengths, disp, initial_distance)


def _reflect_into(x, low, high):
    """Fold a coordinate into [low, high] by reflection (triangle wave) —
    the shifted form of ``trajectory.reflect_into_box`` (single source of
    truth for the reflection map)."""
    return low + reflect_into_box(x - low, high - low)


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
