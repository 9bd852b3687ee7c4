"""Weak-perspective camera and view transform.

Reference semantics: ``src/nmr.py:10-28`` (``orthographic_proj_withz_idrot``)
and the neural_renderer ``look_at`` (which, for JAFPro's default camera
eye = [0, 0, -(1/tan(30 deg)+1)], at=origin, up=+y, reduces to a pure
translation — the rotation matrix is the identity).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def orthographic_proj_withz_idrot(
    X: jnp.ndarray, cam: jnp.ndarray, offset_z: float = 0.0
) -> jnp.ndarray:
    """X: (B, N, 3); cam: (B, 3) = [scale, tx, ty].  xy -> s*(xy+t), keep z."""
    scale = cam[:, 0][:, None, None]
    trans = cam[:, 1:3][:, None, :]
    xy = scale * (X[..., :2] + trans)
    z = X[..., 2:3] + offset_z
    return jnp.concatenate([xy, z], axis=-1)


def default_eye(viewing_angle: float = 30.0) -> np.ndarray:
    return np.array(
        [0.0, 0.0, -(1.0 / np.tan(np.radians(viewing_angle)) + 1.0)],
        dtype=np.float32,
    )


def _normalize(v: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    # matches torch F.normalize(eps=...) : v / max(||v||, eps)
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps)


def look_at(
    vertices: jnp.ndarray,
    eye,
    at=(0.0, 0.0, 0.0),
    up=(0.0, 1.0, 0.0),
) -> jnp.ndarray:
    """General "look at" view transform on (B, N, 3) vertices."""
    eye = jnp.asarray(eye, dtype=vertices.dtype)
    at = jnp.asarray(at, dtype=vertices.dtype)
    up = jnp.asarray(up, dtype=vertices.dtype)
    if eye.ndim == 1:
        eye = eye[None]
    if at.ndim == 1:
        at = at[None]
    if up.ndim == 1:
        up = up[None]

    z_axis = _normalize(at - eye)
    x_axis = _normalize(jnp.cross(up, z_axis))
    y_axis = _normalize(jnp.cross(z_axis, x_axis))
    r = jnp.stack([x_axis, y_axis, z_axis], axis=1)  # (B,3,3)
    return jnp.einsum("bni,bji->bnj", vertices - eye[:, None, :], r)


def project_to_view(
    vertices: jnp.ndarray, cam: jnp.ndarray, viewing_angle: float = 30.0
) -> jnp.ndarray:
    """The fused JAFPro camera path (reference ``nmr.py:263-273``):
    weak-perspective project, flip y, translate by -eye (identity rotation).

    Returns view-space vertices whose xy are in [-1, 1] image coords
    (y down) and z in camera depth.
    """
    proj = orthographic_proj_withz_idrot(vertices, cam)
    proj = proj.at[..., 1].multiply(-1.0)
    eye = default_eye(viewing_angle)
    return proj - jnp.asarray(eye, dtype=proj.dtype)


def vertices_to_faces(vertices: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Gather (B, V, 3) vertices into (B, F, 3, 3) per-face triangles."""
    return vertices[:, faces]  # faces: (F, 3) static int array


def project_to_view_np(
    vertices: np.ndarray, cam: np.ndarray, viewing_angle: float = 30.0
) -> np.ndarray:
    """NumPy twin of ``project_to_view`` for host-side planning (capacity
    selection runs on the clip's cams/verts before any device dispatch).
    vertices: (B, V, 3); cam: (B, 3)."""
    vertices = np.asarray(vertices, np.float32)
    cam = np.asarray(cam, np.float32)
    scale = cam[:, 0][:, None, None]
    trans = cam[:, 1:3][:, None, :]
    xy = scale * (vertices[..., :2] + trans)
    proj = np.concatenate([xy, vertices[..., 2:3]], axis=-1)
    proj[..., 1] *= -1.0
    return proj - default_eye(viewing_angle)
