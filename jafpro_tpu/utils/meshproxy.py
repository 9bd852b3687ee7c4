"""Topology-consistent proxy vertices for the SMPL face graph.

The environment ships the SMPL *topology* (``smpl_faces.npy``) but not the
SMPL body model, so nothing here can pose a real body.  Occupancy planning
and benchmarking still need meshes whose triangles have realistic pixel
extents: assigning independent random positions to vertices makes every
triangle span the whole blob (graph-adjacent vertices land far apart),
which both overstates band occupancy and bears no resemblance to a body
surface.

``smoothed_topology_vertices`` produces a smooth embedding of the face
graph instead: start from random positions and repeatedly average each
vertex with its graph neighbors (graph-Laplacian smoothing, re-normalized
each step so the embedding doesn't collapse).  Adjacent vertices converge
to nearby points, so triangles become small, and regions where the
topology is dense (head, hands) stay dense in space — the properties that
drive per-band face counts on real bodies.
"""

from __future__ import annotations

import numpy as np


def smoothed_topology_vertices(
    faces: np.ndarray,
    iters: int = 80,
    seed: int = 0,
    aspect: tuple = (0.35, 1.0, 0.35),
) -> np.ndarray:
    """(V, 3) smooth embedding of the face graph, scaled to ``aspect``
    (default: a body-like upright ellipsoid filling [-1, 1] in y).

    faces: (F, 3) int vertex ids."""
    faces = np.asarray(faces, np.int64)
    V = int(faces.max()) + 1
    # undirected edge list from face edges
    e = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0)
    src = np.concatenate([e[:, 0], e[:, 1]])
    dst = np.concatenate([e[:, 1], e[:, 0]])
    deg = np.bincount(src, minlength=V).astype(np.float64)[:, None]
    deg = np.maximum(deg, 1.0)

    rng = np.random.RandomState(seed)
    x = rng.normal(size=(V, 3))
    for _ in range(iters):
        nbr = np.zeros((V, 3))
        np.add.at(nbr, src, x[dst])
        x = 0.5 * x + 0.5 * nbr / deg
        x -= x.mean(axis=0)
        x /= np.sqrt((x ** 2).sum(axis=1).mean())  # unit RMS radius
    # scale each axis so the embedding spans roughly [-a, a] per axis
    ext = np.abs(x).max(axis=0)
    x = x / ext * np.asarray(aspect, np.float64)
    return x.astype(np.float32)
