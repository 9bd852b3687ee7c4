"""Full SMPL renderer capability (reference ``src/nmr.py`` SMPLRenderer).

Beyond the fim/wim flow path (in ``flow.py``), this provides the rest of the
neural_renderer surface the reference exposes:

  * ``encode_fim`` — paint per-pixel face attributes via a mapping table
    (reference ``nmr.py:328-352``)
  * ``extract_tex`` / ``dynamic_sampler`` — per-face texture extraction from
    an image by grid sampling (reference ``nmr.py:354-388``; replaces the
    ``load_textures`` CUDA path #22)
  * ``render_rgb`` — textured forward rendering from fim/wim + per-face
    texture cubes, following the CUDA ``forward_texture_sampling`` math
    (depth-corrected barycentric texture coords, trilinear blend over the
    (T, T, T) cube — ``rasterize_cuda_kernel.cu:172-245``; replaces #21)
  * ``lighting`` — ambient + directional modulation of face textures
    (``neural_renderer/lighting.py``)
  * ``render_silhouettes`` / ``render_depth`` — coverage / depth maps.

Gradients: the used JAFPro path needs no rasterizer gradients; ``render_rgb``
is differentiable w.r.t. textures (pure gathers/blends), matching the
forward-only capability the training stack requires.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jafpro_tpu.geometry.projection import (
    orthographic_proj_withz_idrot, project_to_view, vertices_to_faces)
from jafpro_tpu.geometry.rasterizer import rasterize_fim_wim
from jafpro_tpu.ops.sampling import grid_sample


def edge_gradient_surrogate(
    fim: jnp.ndarray, wim: jnp.ndarray, images: jnp.ndarray,
    px: jnp.ndarray,
) -> jnp.ndarray:
    """Occlusion-boundary (coverage) gradient term for rasterized images.

    Returns a tensor that is exactly ZERO in the forward pass but whose
    autodiff pullback carries d(image)/d(vertex position) across coverage
    boundaries — the capability the reference implements imperatively in
    ``rasterize_cuda_kernel.cu:246+`` (``backward_pixel_map``, Kato et al.'s
    anti-aliased edge gradients).  The XLA rasterizer is already
    differentiable for *interior* pixels (barycentric weights are smooth in
    the vertices for a fixed winning face); this supplies the missing
    boundary term, TPU-natively: no edge walking, no atomics — four shifted
    finite differences and one weighted gather, all static shapes.

    First-order model (the same one the CUDA kernel discretizes): moving a
    face's silhouette outward in direction d by one pixel repaints each
    just-outside neighbor pixel b from I_b to the adjacent covered pixel's
    I_a, so dI_b/d(edge shift) ~ (I_a - I_b); an edge point's motion follows
    the face's vertices with the boundary pixel's barycentric weights.
    Implemented as a surrogate linear in ``px - stop_grad(px)`` so a plain
    ``images + surrogate`` gives the corrected VJP for any cotangent.

    Approximation note: when two faces meet at a boundary, each receives an
    expansion gradient regardless of which would win the z-buffer after the
    move (the CUDA kernel re-checks depth per edge pixel).  Exact for the
    dominant case — silhouette-vs-background — and first-order correct
    elsewhere.

    Args (all in the SAME unflipped orientation — row index increasing with
    clip y, i.e. the rasterizer's ``flip_y=False`` frame):
      fim (B, S, S) int32 [-1 bg], wim (B, S, S, 3),
      images (B, S, S, C) the rendered values whose boundary gradient is
      wanted (RGB render, silhouettes, depth, ...),
      px (B, F, 3, 2) pixel-space vertex coords built from the DIFFERENTIABLE
      view vertices: ``0.5 * (fv_xy * S + S - 1)``.
    """
    delta = px - jax.lax.stop_gradient(px)          # 0-valued, carries grad
    covered = fim >= 0
    safe = jnp.where(covered, fim, 0)
    delta_f = jax.vmap(lambda d, i: d[i])(delta, safe)   # (B, S, S, 3, 2)
    # per-pixel silhouette shift of the covering face (0-valued forward)
    shift = jnp.sum(
        jax.lax.stop_gradient(wim)[..., None] * delta_f, axis=-2
    )                                                # (B, S, S, 2)

    zero = jnp.zeros_like(images)
    out = zero

    def shift_map(arr, dy, dx, fill):
        """arr shifted so position (y, x) reads arr[y - dy, x - dx]."""
        pad = [(0, 0), (max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))]
        pad += [(0, 0)] * (arr.ndim - 3)
        a = jnp.pad(arr, pad, constant_values=fill)
        S = images.shape[1]
        y0, x0 = max(-dy, 0), max(-dx, 0)
        return a[:, y0:y0 + S, x0:x0 + S]

    # direction (dy, dx, component, sign): face at a = b - (dy, dx) expands
    # toward b when its vertices move by sign along component
    for dy, dx, comp, sign in ((0, 1, 0, 1.0), (0, -1, 0, -1.0),
                               (1, 0, 1, 1.0), (-1, 0, 1, -1.0)):
        fim_a = shift_map(fim, dy, dx, -1)
        img_a = shift_map(images, dy, dx, 0.0)
        cov_a = shift_map(covered, dy, dx, False)
        shift_a = shift_map(shift[..., comp], dy, dx, 0.0)
        mask = cov_a & (fim_a != fim)               # boundary seen from b
        dI = jax.lax.stop_gradient(img_a - images)  # repaint b -> a's color
        out = out + jnp.where(mask[..., None],
                              dI * (sign * shift_a)[..., None], zero)
    return out


def encode_fim(fim: jnp.ndarray, map_fn: jnp.ndarray) -> jnp.ndarray:
    """fim (B, S, S) int32 with -1 bg; map_fn (F+1, C) with last row = bg.
    Returns (B, S, S, C)."""
    F1 = map_fn.shape[0]
    idx = jnp.where(fim >= 0, fim, F1 - 1)
    return map_fn[idx]


def points_to_sampler(coords: jnp.ndarray, faces_pts: jnp.ndarray) -> jnp.ndarray:
    """coords (2, T*T) barycentric alphas; faces_pts (B, F, 3, 2) ->
    (B, F, T*T, 2) clamped to [-1, 1] (reference ``nmr.py:451-470``)."""
    v2 = faces_pts[:, :, 2]
    v0v2 = faces_pts[:, :, 0] - v2
    v1v2 = faces_pts[:, :, 1] - v2
    basis = jnp.stack([v0v2, v1v2], axis=-1)  # (B, F, 2, 2)
    samples = jnp.einsum("bfij,jk->bfik", basis, coords) + v2[..., None]
    return jnp.clip(jnp.transpose(samples, (0, 1, 3, 2)), -1.0, 1.0)


def create_coords(tex_size: int = 3) -> np.ndarray:
    """(2, T*T) barycentric sample grid (reference ``nmr.py:472-488``)."""
    step = 1.0 if tex_size == 1 else 1.0 / (tex_size - 1)
    ab = np.arange(0, 1 + step, step, dtype=np.float32)[:tex_size]
    xv, yv = np.meshgrid(ab, ab, indexing="ij")
    return np.stack([xv.ravel(), yv.ravel()], axis=0)


@dataclasses.dataclass
class SMPLRenderer:
    faces: np.ndarray                  # (F, 3) int32
    image_size: int = 256
    tex_size: int = 3
    near: float = 0.1
    far: float = 25.0
    viewing_angle: float = 30.0
    chunk: int = 512
    light_intensity_ambient: float = 1.0
    light_intensity_directional: float = 0.0
    light_color_ambient: Tuple[float, float, float] = (1, 1, 1)
    light_color_directional: Tuple[float, float, float] = (1, 1, 1)
    light_direction: Tuple[float, float, float] = (0, 1, 0)

    def _view_faces(self, cam, vertices):
        view_verts = project_to_view(vertices, cam, self.viewing_angle)
        return vertices_to_faces(view_verts, jnp.asarray(self.faces))

    # ---- maps ----

    def render_fim_wim(self, cam, vertices):
        fv = self._view_faces(cam, vertices)
        fim, wim = rasterize_fim_wim(
            fv, image_size=self.image_size, near=self.near, far=self.far,
            chunk=self.chunk)
        return fv, fim, wim

    def render_fim(self, cam, vertices):
        return self.render_fim_wim(cam, vertices)[1]

    def render_silhouettes(self, cam, vertices, edge_gradients: bool = False):
        """Coverage map (B, S, S).  ``edge_gradients=True`` makes it
        differentiable w.r.t. vertices/cam via the boundary surrogate
        (reference ``rasterize_cuda.cpp`` backward_silhouette path)."""
        fv, fim, wim = self.render_fim_wim(cam, vertices)
        sil = (fim >= 0).astype(fv.dtype)
        if not edge_gradients:
            return sil
        px = 0.5 * (fv[..., :2] * self.image_size + self.image_size - 1)
        surr = edge_gradient_surrogate(
            fim[:, ::-1], wim[:, ::-1], sil[:, ::-1, :, None], px)
        return sil + surr[:, ::-1, :, 0]

    def render_depth(self, cam, vertices):
        fv = self._view_faces(cam, vertices)
        _, _, depth = rasterize_fim_wim(
            fv, image_size=self.image_size, near=self.near, far=self.far,
            chunk=self.chunk, return_depth=True)
        return depth

    # ---- texture extraction (dynamic sampling) ----

    def dynamic_sampler(self, cam, vertices):
        """(B, F, T*T, 2) image-space sample grids per face
        (reference ``nmr.py:382-388``)."""
        pts = orthographic_proj_withz_idrot(vertices, cam)[..., :2]
        faces_pts = vertices_to_faces(pts, jnp.asarray(self.faces))
        coords = jnp.asarray(create_coords(self.tex_size))
        return points_to_sampler(coords, faces_pts)

    def extract_tex(self, uv_img: jnp.ndarray, sampler: jnp.ndarray):
        """uv_img (B, H, W, 3), sampler (B, F, T*T, 2) ->
        (B, F, T, T, T, 3) texture cubes (reference ``nmr.py:364-380``)."""
        B, F, TT, _ = sampler.shape
        T = self.tex_size
        tex = grid_sample(uv_img, sampler, padding_mode="zeros")
        tex = tex.reshape(B, F, T, T, 1, 3)
        return jnp.broadcast_to(tex, (B, F, T, T, T, 3))

    def extract_tex_from_image(self, images, cam, vertices):
        return self.extract_tex(images, self.dynamic_sampler(cam, vertices))

    # ---- lighting (neural_renderer/lighting.py) ----

    def lighting(self, face_verts: jnp.ndarray, textures: jnp.ndarray):
        """face_verts (B, F, 3, 3) world coords; textures (B, F, T, T, T, 3).
        ambient + directional Lambertian modulation."""
        v10 = face_verts[:, :, 1] - face_verts[:, :, 0]
        v20 = face_verts[:, :, 2] - face_verts[:, :, 0]
        n = jnp.cross(v10, v20)
        n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-8)
        light_dir = jnp.asarray(self.light_direction, textures.dtype)
        cos = jnp.maximum(jnp.einsum("bfc,c->bf", n, light_dir), 0.0)
        amb = self.light_intensity_ambient * jnp.asarray(
            self.light_color_ambient, textures.dtype)
        dir_ = self.light_intensity_directional * jnp.asarray(
            self.light_color_directional, textures.dtype)
        light = amb + cos[..., None] * dir_  # (B, F, 3)
        return textures * light[:, :, None, None, None, :]

    # ---- full textured render ----

    def render(self, cam, vertices, textures, get_fim: bool = False,
               edge_gradients: bool = False):
        """Textured forward rendering (reference ``nmr.py:210-244`` /
        CUDA ``forward_texture_sampling``).

        textures: (B, F, T, T, T, 3).  Returns images (B, S, S, 3)
        [, fim].

        Differentiability: always w.r.t. textures and (for interior pixels)
        vertices; ``edge_gradients=True`` adds the occlusion-boundary
        vertex-gradient term (the CUDA ``backward_pixel_map`` capability,
        ``rasterize_cuda_kernel.cu:246+``) via ``edge_gradient_surrogate``.
        """
        fv_world = vertices_to_faces(vertices, jnp.asarray(self.faces))
        textures = self.lighting(fv_world, textures)

        fv = self._view_faces(cam, vertices)
        fim, wim, depth = rasterize_fim_wim(
            fv, image_size=self.image_size, near=self.near, far=self.far,
            chunk=self.chunk, return_depth=True)

        B, F = fv.shape[:2]
        T = self.tex_size
        S = self.image_size
        found = fim >= 0
        safe = jnp.where(found, fim, 0)

        # per-pixel face data
        def gather_face(arr, idx):
            return arr[idx]

        face_z = jax.vmap(gather_face)(fv[..., 2], safe)      # (B, S, S, 3)
        tex_pix = jax.vmap(gather_face)(
            textures.reshape(B, F, T * T * T, 3), safe)       # (B, S, S, T^3, 3)

        # texture_index_float[k] = clip(w_k * (T-1) * depth / z_k, 0, T-1-eps)
        eps = 1e-3
        tif = wim * (T - 1) * (depth[..., None] / face_z)
        tif = jnp.clip(tif, 0.0, T - 1 - eps)

        lo = jnp.floor(tif)
        frac = tif - lo
        lo = lo.astype(jnp.int32)

        # trilinear blend over the 8 corners of the (T,T,T) cube
        out = jnp.zeros((B, S, S, 3), textures.dtype)
        for corner in range(8):
            w = jnp.ones_like(tif[..., 0])
            idx = jnp.zeros_like(lo[..., 0])
            for k in range(3):
                bit = (corner >> k) & 1
                if bit:
                    w = w * frac[..., k]
                    ik = lo[..., k] + 1
                else:
                    w = w * (1.0 - frac[..., k])
                    ik = lo[..., k]
                mult = T ** (2 - k)
                idx = idx + ik * mult
            corner_tex = jnp.take_along_axis(
                tex_pix, idx[..., None, None], axis=3)[..., 0, :]
            out = out + w[..., None] * corner_tex

        images = jnp.where(found[..., None], out, 0.0)
        if edge_gradients:
            px = 0.5 * (fv[..., :2] * S + S - 1)
            surr = edge_gradient_surrogate(
                fim[:, ::-1], wim[:, ::-1], images[:, ::-1], px)
            images = images + surr[:, ::-1]
        if get_fim:
            return images, fim
        return images
