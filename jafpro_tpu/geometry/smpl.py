"""Batched SMPL body model: linear blend skinning in pure jnp.

Functional re-design of the reference's ``src/batch_smpl.py:285-375``:
shape blendshapes -> joint regression -> per-joint Rodrigues rotations ->
pose blendshapes -> kinematic-chain global transforms -> LBS skinning ->
cocoplus joints.  Everything is batched matmuls (MXU) except the 24-step
kinematic chain, which is unrolled (static, tiny).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np


def batch_rodrigues(theta: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (N, 3) -> rotation matrices (N, 3, 3).

    Matches reference ``batch_smpl.py:64-101`` including its ``theta + 1e-8``
    norm regularization.
    """
    angle = jnp.linalg.norm(theta + 1e-8, axis=1, keepdims=True)  # (N,1)
    r = theta / angle  # (N,3)
    cos = jnp.cos(angle)[..., None]  # (N,1,1)
    sin = jnp.sin(angle)[..., None]
    outer = r[:, :, None] * r[:, None, :]  # (N,3,3)
    eye = jnp.eye(3, dtype=theta.dtype)
    zeros = jnp.zeros_like(r[:, 0])
    # skew(r)
    K = jnp.stack(
        [
            jnp.stack([zeros, -r[:, 2], r[:, 1]], axis=1),
            jnp.stack([r[:, 2], zeros, -r[:, 0]], axis=1),
            jnp.stack([-r[:, 1], r[:, 0], zeros], axis=1),
        ],
        axis=1,
    )
    return cos * eye + (1.0 - cos) * outer + sin * K


def _make_A(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(N,3,3) rotation + (N,3) translation -> (N,4,4) homogeneous."""
    N = R.shape[0]
    top = jnp.concatenate([R, t[:, :, None]], axis=2)  # (N,3,4)
    bottom = jnp.broadcast_to(
        jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=R.dtype), (N, 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=1)


def batch_global_rigid_transformation(
    Rs: jnp.ndarray, Js: jnp.ndarray, parents: np.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Kinematic chain (reference ``batch_smpl.py:129-218``).

    Args:
      Rs: (N, 24, 3, 3); Js: (N, 24, 3); parents: static (24,) int.
    Returns: (new_J (N,24,3), A (N,24,4,4)) relative transforms for LBS.
    """
    N = Rs.shape[0]
    results = [_make_A(Rs[:, 0], Js[:, 0])]
    for i in range(1, parents.shape[0]):
        t_here = Js[:, i] - Js[:, int(parents[i])]
        A_here = _make_A(Rs[:, i], t_here)
        results.append(jnp.matmul(results[int(parents[i])], A_here))
    results = jnp.stack(results, axis=1)  # (N,24,4,4)
    new_J = results[:, :, :3, 3]

    # A = results - pack(results @ [J; 0])  (skinning uses bone displacement)
    Js_w0 = jnp.concatenate([Js, jnp.zeros((N, Js.shape[1], 1), Js.dtype)], axis=2)
    init_bone = jnp.einsum("nkij,nkj->nki", results, Js_w0)  # (N,24,4)
    pad = jnp.zeros_like(results)
    pad = pad.at[:, :, :, 3].set(init_bone)
    return new_J, results - pad


@dataclasses.dataclass
class SMPLModel:
    """SMPL parameters as plain arrays (loadable from the standard pkl).

    The main JAFPro path consumes dataset-provided vertices; this model is the
    capability-parity equivalent of reference ``src/batch_smpl.py`` (used
    inside HMR) and is exercised by tests with synthetic parameter sets.
    """

    v_template: jnp.ndarray     # (V, 3)
    shapedirs: jnp.ndarray      # (num_betas, V*3)
    posedirs: jnp.ndarray       # (207, V*3)
    J_regressor: jnp.ndarray    # (V, 24)
    weights: jnp.ndarray        # (V, 24)
    parents: np.ndarray         # (24,) static
    joint_regressor: Optional[jnp.ndarray] = None  # (V, 19)
    faces: Optional[np.ndarray] = None             # (F, 3) int32

    @classmethod
    def from_pkl(cls, path: str) -> "SMPLModel":
        import pickle

        with open(path, "rb") as f:
            dd = pickle.load(f, encoding="latin1")

        def dense(x):
            return np.asarray(x.todense()) if hasattr(x, "todense") else np.asarray(x)

        num_betas = dd["shapedirs"].shape[-1]
        return cls(
            v_template=jnp.asarray(np.asarray(dd["v_template"], np.float32)),
            shapedirs=jnp.asarray(
                np.asarray(dd["shapedirs"], np.float32).reshape(-1, num_betas).T
            ),
            posedirs=jnp.asarray(
                np.asarray(dd["posedirs"], np.float32).reshape(-1, 207).T
            ),
            J_regressor=jnp.asarray(dense(dd["J_regressor"]).T.astype(np.float32)),
            weights=jnp.asarray(np.asarray(dd["weights"], np.float32)),
            parents=np.asarray(dd["kintree_table"][0], np.int32),
            joint_regressor=(
                jnp.asarray(dense(dd["cocoplus_regressor"]).T.astype(np.float32))
                if "cocoplus_regressor" in dd
                else None
            ),
            faces=np.asarray(dd["f"], np.int32) if "f" in dd else None,
        )

    @classmethod
    def synthetic(cls, num_verts: int = 64, num_betas: int = 10, seed: int = 0):
        """Random small model for tests (no SMPL pkl required)."""
        rng = np.random.RandomState(seed)
        V = num_verts
        parents = np.concatenate([[0], np.arange(23)]).astype(np.int32)
        Jr = rng.rand(V, 24).astype(np.float32)
        Jr /= Jr.sum(0, keepdims=True)
        W = rng.rand(V, 24).astype(np.float32)
        W /= W.sum(1, keepdims=True)
        return cls(
            v_template=jnp.asarray(rng.randn(V, 3).astype(np.float32)),
            shapedirs=jnp.asarray(0.01 * rng.randn(num_betas, V * 3).astype(np.float32)),
            posedirs=jnp.asarray(0.001 * rng.randn(207, V * 3).astype(np.float32)),
            J_regressor=jnp.asarray(Jr),
            weights=jnp.asarray(W),
            parents=parents,
            joint_regressor=jnp.asarray((rng.rand(V, 19) / V).astype(np.float32)),
        )

    def __call__(self, beta: jnp.ndarray, theta: jnp.ndarray, get_skin: bool = True):
        """beta: (N, num_betas), theta: (N, 72) axis-angle (incl. global rot).

        Returns (verts (N,V,3), joints (N,19,3), Rs (N,24,3,3)) when
        ``get_skin`` else joints.
        """
        N = beta.shape[0]
        V = self.v_template.shape[0]

        v_shaped = (beta @ self.shapedirs).reshape(N, V, 3) + self.v_template
        J = jnp.einsum("nvc,vk->nkc", v_shaped, self.J_regressor)  # (N,24,3)

        Rs = batch_rodrigues(theta.reshape(-1, 3)).reshape(N, 24, 3, 3)
        pose_feature = (Rs[:, 1:] - jnp.eye(3, dtype=Rs.dtype)).reshape(N, 207)
        v_posed = (pose_feature @ self.posedirs).reshape(N, V, 3) + v_shaped

        _, A = batch_global_rigid_transformation(Rs, J, self.parents)

        T = jnp.einsum("vk,nkij->nvij", self.weights, A)  # (N,V,4,4)
        v_h = jnp.concatenate([v_posed, jnp.ones((N, V, 1), v_posed.dtype)], axis=2)
        verts = jnp.einsum("nvij,nvj->nvi", T, v_h)[..., :3]

        if self.joint_regressor is not None:
            joints = jnp.einsum("nvc,vk->nkc", verts, self.joint_regressor)
        else:
            joints = jnp.einsum("nvc,vk->nkc", verts, self.J_regressor)

        if get_skin:
            return verts, joints, Rs
        return joints
