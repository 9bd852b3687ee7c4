"""HMR: Human Mesh Recovery regressor (capability parity).

Re-design of reference ``src/hmr.py``: PreActResNet50-v2 encoder (the
TF-style pre-activation bottleneck with biased 1x1 conv3/shortcut) + an
iterative 3-step ``ThetaRegressor`` producing the 85-dim theta =
[cam(3), pose(72), shape(10)].

Note: on the main JAFPro train/test path the HMR network is constructed but
never invoked — SMPL vertices come from the dataset pickles
(``src/cal_flow.py:17-19`` loads it; ``forward`` never calls it).  It is
provided for full capability parity and for converting the ``hmr_tf2pt``
weights.  Eval-mode batch norm (running statistics).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from jafpro_tpu.geometry.projection import orthographic_proj_withz_idrot


class _PreActBottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        out_planes = self.expansion * self.planes
        preact = nn.relu(nn.BatchNorm(use_running_average=not train,
                                      name="bn1")(x))
        if in_planes != out_planes:
            shortcut = nn.Conv(out_planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=True, name="shortcut",
                               dtype=self.dtype)(preact)
        elif self.stride != 1:
            # subsample: 1x1 max pool with stride
            shortcut = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 1, 1),
                (1, self.stride, self.stride, 1), "VALID")
        else:
            shortcut = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1",
                    dtype=self.dtype)(preact)
        y = nn.relu(nn.BatchNorm(use_running_average=not train, name="bn2")(y))
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, name="conv2",
                    dtype=self.dtype)(y)
        y = nn.relu(nn.BatchNorm(use_running_average=not train, name="bn3")(y))
        y = nn.Conv(out_planes, (1, 1), use_bias=True, name="conv3",
                    dtype=self.dtype)(y)
        return y + shortcut


class PreActResNet50(nn.Module):
    """TF-style layout: stride-2 on the *last* block of each layer
    (reference ``hmr.py:140-147``), post-BN + ReLU + 7x7 global avg pool."""

    num_blocks: Sequence[int] = (3, 4, 6, 3)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=True, name="conv1", dtype=self.dtype)(x)
        # torch max_pool2d(k3, s2, ceil_mode=True)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                  (1, 2, 2, 1), "VALID")
        planes = (64, 128, 256, 512)
        strides = (2, 2, 2, 1)
        for li, (p, n, s) in enumerate(zip(planes, self.num_blocks, strides)):
            for bi in range(n):
                stride = s if bi == n - 1 else 1
                x = _PreActBottleneck(p, stride, dtype=self.dtype,
                                      name=f"layer{li + 1}_{bi}")(x, train)
        x = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 name="post_bn")(x))
        x = jnp.mean(x, axis=(1, 2))  # global 7x7 avg pool
        return x


class ThetaRegressor(nn.Module):
    """Iterative residual regression of theta (reference ``hmr.py:213-252``)."""

    theta_dim: int = 85
    iterations: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, features, train: bool = False):
        B = features.shape[0]
        mean_theta = self.param(
            "mean_theta", nn.initializers.uniform(1.0), (self.theta_dim,))
        theta = jnp.broadcast_to(mean_theta, (B, self.theta_dim))
        fc1 = nn.Dense(1024, name="fc1", dtype=self.dtype)
        fc2 = nn.Dense(1024, name="fc2", dtype=self.dtype)
        fc3 = nn.Dense(
            self.theta_dim, name="fc3", dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(
                0.01, "fan_avg", "truncated_normal"))
        for _ in range(self.iterations):
            h = jnp.concatenate([features, theta], axis=1)
            h = nn.relu(fc1(h))
            h = nn.relu(fc2(h))
            theta = theta + fc3(h)
        return theta


class HumanModelRecovery(nn.Module):
    """image (B, 224, 224, 3) -> theta (B, 85)."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = PreActResNet50(dtype=self.dtype, name="resnet")(x, train)
        return ThetaRegressor(dtype=self.dtype, name="regressor")(
            features, train)


def get_details(smpl_model, theta: jnp.ndarray) -> dict:
    """Split theta and run SMPL (reference ``hmr.py:302-329``)."""
    cam, pose, shape = theta[:, 0:3], theta[:, 3:75], theta[:, 75:]
    verts, j3d, _ = smpl_model(shape, pose, get_skin=True)
    j2d = orthographic_proj_withz_idrot(j3d, cam)[..., :2]
    return {"theta": theta, "cam": cam, "pose": pose, "shape": shape,
            "verts": verts, "j2d": j2d, "j3d": j3d}
