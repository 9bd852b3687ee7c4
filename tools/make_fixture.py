"""Deterministic DanceVideo-layout fixture with a LEARNABLE signal.

The quality-at-speed record (QUALITY.md) needs a dataset this environment
can host on which the 4-stage curriculum measurably improves SSIM/PSNR —
the honest stand-in for DanceVideo parity (reference acceptance:
``test/video_evaluation.py:184-246``).  Random-noise fixtures can't be
learned; here every ground-truth frame is constructed EXACTLY as

    frame = transfer_texture(gt_atlas, IUV)  over a fixed background

so the texture-accumulate -> inpaint -> warp path can in principle
reconstruct frames perfectly, and the per-frame texture atlases are
partial (moving visibility masks) so accumulation/inpainting have real
work to do.

Layout written (reference ``src/utils.py:11-58``):
    <root>/data/<mode>/<vid>/frame_NNNNNN[.jpg|_IUV.png|_text.png|_mask.png]
    <root>/smpl/<mode>/<vid>/pose_shape.pkl
    <root>/mask/<mode>/<vid>/frame_NNNNNN.png

Usage: python tools/make_fixture.py <root> [--vids 3] [--frames 12]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def smooth_atlas(rng: np.random.RandomState, part: int = 200) -> np.ndarray:
    """A colorful smooth 800x1200 texture atlas (uint8)."""
    yy, xx = np.mgrid[0:4 * part, 0:6 * part].astype(np.float32)
    phase = rng.uniform(0, 2 * np.pi, (3, 4))
    freq = rng.uniform(0.5, 2.0, (3, 4))
    chans = []
    for c in range(3):
        v = (np.sin(freq[c, 0] * 2 * np.pi * xx / (6 * part) + phase[c, 0])
             + np.sin(freq[c, 1] * 2 * np.pi * yy / (4 * part) + phase[c, 1])
             + np.sin(freq[c, 2] * 2 * np.pi * (xx + yy) / (5 * part)
                      + phase[c, 2]))
        chans.append(v)
    a = np.stack(chans, -1)
    a = (a - a.min()) / (a.max() - a.min())
    return (a * 255).astype(np.uint8)


def make_iuv(t: int, T: int, S: int = 256) -> np.ndarray:
    """Body-like IUV map: an ellipse sweeping horizontally across the frame,
    split into 24 vertical part bands, with smooth in-part UV coords."""
    iuv = np.zeros((S, S, 3), np.uint8)
    cx = S * (0.3 + 0.4 * t / max(T - 1, 1))
    cy = S * 0.5
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32)
    body = ((xx - cx) / (S * 0.18)) ** 2 + ((yy - cy) / (S * 0.4)) ** 2 <= 1.0
    ys, xs = np.where(body)
    y0, y1 = ys.min(), ys.max() + 1
    # 24 horizontal slabs top-to-bottom => part index 1..24
    part = 1 + np.clip(((yy - y0) / max(y1 - y0, 1) * 24).astype(np.int32),
                       0, 23)
    u = np.clip((xx - (cx - S * 0.18)) / (2 * S * 0.18), 0, 1)
    v_band = ((yy - y0) / max(y1 - y0, 1) * 24) % 1.0
    iuv[..., 0] = np.where(body, part, 0)
    iuv[..., 1] = np.where(body, (u * 255), 0).astype(np.uint8)
    iuv[..., 2] = np.where(body, (v_band * 255), 0).astype(np.uint8)
    return iuv


def visibility_mask(rng: np.random.RandomState, t: int, part: int = 200
                    ) -> np.ndarray:
    """Per-frame partial atlas visibility: a moving soft window over the
    atlas (so no single frame sees the whole texture — accumulation across
    references is required, like real per-frame DensePose unwraps)."""
    H, W = 4 * part, 6 * part
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    cx = W * ((0.2 + 0.13 * t + rng.uniform(0, 0.05)) % 1.0)
    cy = H * ((0.3 + 0.17 * t + rng.uniform(0, 0.05)) % 1.0)
    dx = np.minimum(np.abs(xx - cx), W - np.abs(xx - cx))  # wrap-around
    dy = np.minimum(np.abs(yy - cy), H - np.abs(yy - cy))
    vis = (dx / W) ** 2 + (dy / H) ** 2 > 0.03  # hide a moving hole
    return vis.astype(np.uint8) * 255


def write_fixture(root: str, vids_per_mode: int = 3, frames: int = 12,
                  image_size: int = 256, seed: int = 0) -> None:
    import cv2

    from jafpro_tpu.data.texture import transfer_texture
    from jafpro_tpu.utils.meshproxy import smoothed_topology_vertices

    rng = np.random.RandomState(seed)
    faces_path = os.environ.get(
        "JAFPRO_SMPL_FACES", "/root/reference/smpl_faces.npy")
    if os.path.exists(faces_path):
        faces = np.load(faces_path).astype(np.int32)
        base_verts = smoothed_topology_vertices(faces)
    else:  # asset-free host: small synthetic mesh
        from jafpro_tpu.train.common import synthetic_quad_mesh

        base_verts, faces = synthetic_quad_mesh(16)
    S = image_size

    # fixed background shared by all clips of a mode (bg net learns it)
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32) / S
    bg = np.stack([0.2 + 0.6 * xx, 0.3 + 0.4 * yy,
                   0.7 - 0.4 * xx * yy], -1)
    bg = (bg * 255).astype(np.uint8)

    for mode in ("train", "test"):
        n_vids = vids_per_mode if mode == "train" else max(
            vids_per_mode - 1, 1)
        for v in range(n_vids):
            vid = f"vid_{mode}_{v:02d}"
            atlas = smooth_atlas(np.random.RandomState(seed + 100 + v))
            ddir = os.path.join(root, "data", mode, vid)
            sdir = os.path.join(root, "smpl", mode, vid)
            mdir = os.path.join(root, "mask", mode, vid)
            for d in (ddir, sdir, mdir):
                os.makedirs(d, exist_ok=True)

            verts_seq = np.zeros((frames, base_verts.shape[0], 3), np.float32)
            for t in range(frames):
                iuv = make_iuv(t, frames, S)
                body = (iuv[..., 0] > 0)
                fg = transfer_texture(atlas, iuv.astype(np.float32))
                img = np.where(body[..., None], fg, bg).astype(np.uint8)
                vis = visibility_mask(np.random.RandomState(
                    seed + 1000 * v + t), t)
                text = (atlas * (vis[..., None] // 255)).astype(np.uint8)
                cv2.imwrite(os.path.join(ddir, f"frame_{t:06d}.jpg"), img)
                cv2.imwrite(os.path.join(ddir, f"frame_{t:06d}_IUV.png"), iuv)
                cv2.imwrite(os.path.join(ddir, f"frame_{t:06d}_text.png"),
                            text)
                cv2.imwrite(os.path.join(ddir, f"frame_{t:06d}_mask.png"),
                            np.repeat(vis[..., None], 3, 2))
                cv2.imwrite(os.path.join(mdir, f"frame_{t:06d}.png"),
                            body.astype(np.uint8)[..., None].repeat(3, 2)
                            * 255)
                # small rigid sway, like the bench's motion model
                off = np.float32([0.05 * np.sin(2 * np.pi * t / frames),
                                  0.02 * np.cos(2 * np.pi * t / frames), 0])
                verts_seq[t] = base_verts + off
            verts_seq[..., 2] += 2.0
            with open(os.path.join(sdir, "pose_shape.pkl"), "wb") as f:
                pickle.dump({
                    "cams": np.tile(np.float32([[1.0, 0.0, 0.0]]),
                                    (frames, 1)),
                    "pose": np.zeros((frames, 72), np.float32),
                    "shape": np.zeros((frames, 10), np.float32),
                    "vertices": verts_seq,
                }, f)
            print(f"wrote {vid}: {frames} frames")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--vids", type=int, default=3)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    write_fixture(a.root, a.vids, a.frames, a.image_size, a.seed)


if __name__ == "__main__":
    main()
