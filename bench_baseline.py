"""Measure the PyTorch reference's end-to-end inference throughput and
record it as BENCH_BASELINE.json (the denominator of bench.py's
``vs_baseline``).

This composes the reference's *own* torch modules
(``/root/reference/src``: Accumulate_LSTM_no_loss, UNet_inpainter,
CRN_smaller x2, Propagation3DFlowNet) exactly as
``test/conv_pro_test.py:199-279`` does — per-part accumulate, union-mask,
inpaint, bg once, then per frame: 24-part texture warp, refine, fuse,
barycentric flow transform + border grid_sample, propagate — with random
weights on the same synthetic clip shapes bench.py uses (4 refs, 30
frames, 256px, 24x200x200 parts, 13776 faces).

Hardware caveats (all favor the BASELINE, making vs_baseline conservative):
  * Runs torch on this host's CPU (the reference's CUDA build cannot run
    here; no NVIDIA GPU exists in the environment).
  * The CUDA rasterizer (``rasterize_cuda_kernel.cu``) is EXCLUDED from the
    timed loop: fim/wim maps are precomputed, so the baseline pays nothing
    for the two per-frame rasterizations the TPU pipeline's timed number
    includes.
  * ``cal_bc_transform`` (``src/nmr.py:617-659``) and
    ``texture_warp_pytorch`` (``test/conv_pro_test.py:41-74``) call
    ``.cuda()`` unconditionally; their math is reproduced here 1:1 on CPU
    (same per-part / per-batch loop structure, same grid_sample calls).
"""

from __future__ import annotations

import json
import sys
import time
import types

import numpy as np

REF = "/root/reference"


def _stub_torchvision():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv.models = types.ModuleType("torchvision.models")
    tv.models.vgg19 = None
    tv.models.vgg16 = None
    tv.transforms = types.ModuleType("torchvision.transforms")
    tv.transforms.functional = types.ModuleType(
        "torchvision.transforms.functional")
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv.models
    sys.modules["torchvision.transforms"] = tv.transforms
    sys.modules["torchvision.transforms.functional"] = tv.transforms.functional


def _patch_lstm_cpu(conv_lstm, module, sizes=(200, 100, 50, 25, 13)):
    """Point the reference ConvLSTM cells at CPU zeros with the right
    spatial sizes (the reference hardcodes .cuda() and 200px)."""
    import torch

    def init_hidden(self, batch_size, cuda=True):
        return (torch.zeros(batch_size, self.hidden_dim, self.height,
                            self.width),
                torch.zeros(batch_size, self.hidden_dim, self.height,
                            self.width))

    conv_lstm.ConvLSTMCell.init_hidden = init_hidden
    for p in range(24):
        ds = module.Downsampler_list[p]
        for lvl, s in enumerate(sizes):
            cell = getattr(ds, f"convLSTM{lvl + 1}").cell_list[0]
            cell.height = cell.width = s


def texture_warp_cpu(torch, tex_parts, iuv255):
    """CPU rendition of ``texture_warp_pytorch`` (conv_pro_test.py:41-74):
    per part, grid_sample the 200px texture through the IUV coordinates and
    paste where the part index matches."""
    F = torch.nn.functional
    U = iuv255[:, :, 1]
    V = iuv255[:, :, 2]
    out = torch.zeros(iuv255.shape, dtype=torch.float32).unsqueeze(
        0).permute(0, 3, 1, 2)
    zeros = torch.zeros(U.shape)
    for part in range(1, 25):
        tex = tex_parts[part - 1]
        sel = iuv255[:, :, 0] == part
        u = torch.where(sel, U.float(), zeros)
        v = torch.where(sel, V.float(), zeros)
        x = ((255 - v) / 255.0 - 0.5) * 2
        y = (u / 255.0 - 0.5) * 2
        grid = torch.cat([x.unsqueeze(2), y.unsqueeze(2)], dim=2).unsqueeze(0)
        sampled = F.grid_sample(tex.unsqueeze(0).float(), grid,
                                mode="bilinear", align_corners=True)
        out = torch.where(sel, sampled, out)
    return out.squeeze(0)


def cal_bc_transform_cpu(torch, src_f2pts, dst_fims, dst_wims, image_size):
    """CPU rendition of ``SMPLRenderer.cal_bc_transform``
    (src/nmr.py:617-659): same per-batch loop, masked gather and
    barycentric blend."""
    bs = src_f2pts.shape[0]
    T = -2 * torch.ones((bs, image_size * image_size, 2),
                        dtype=torch.float32)
    for i in range(bs):
        fmap = dst_fims[i].long().reshape(-1)
        wmap = dst_wims[i].reshape(-1, 3)
        exist = fmap != -1
        face_idx = fmap[exist]
        w = wmap[exist]
        T[i, exist] = (src_f2pts[i][face_idx] * w[:, :, None]).sum(dim=1)
    return T.view(bs, image_size, image_size, 2)


def main():
    _stub_torchvision()
    sys.path.insert(0, REF)
    import torch
    import src.convLSTM as conv_lstm
    from src.crn_model import CRN_smaller
    from src.flow_net import Propagation3DFlowNet
    from src.networks import Accumulate_LSTM_no_loss, UNet_inpainter

    F = torch.nn.functional
    torch.manual_seed(0)
    R, S, p, T, NF = 4, 256, 200, 30, 13776

    accu = Accumulate_LSTM_no_loss().eval()
    _patch_lstm_cpu(conv_lstm, accu)
    inpaint = UNet_inpainter().eval()
    bg_model = CRN_smaller(3).eval()
    refine_model = CRN_smaller(3, fg=True).eval()
    propagater = Propagation3DFlowNet(9, 32, 2, 3, use_deconv=False).eval()

    rng = np.random.RandomState(0)
    src_texture_im = torch.from_numpy(
        rng.uniform(-1, 1, (1, R, 3, 800, 1200)).astype(np.float32))
    src_mask_im = torch.from_numpy(
        (rng.rand(1, R, 800, 1200) > 0.5).astype(np.float32))
    iuv = np.zeros((T, S, S, 3), np.float32)
    iuv[..., 0] = rng.randint(0, 25, (T, S, S))
    iuv[..., 1:] = rng.randint(0, 256, (T, S, S, 2))
    tgt_IUV255 = torch.from_numpy(iuv)
    tgt_IUV = (tgt_IUV255 / 255.0 - 0.5) * 2.0
    bg_incomplete = torch.from_numpy(
        rng.uniform(-1, 1, (1, 3, S, S)).astype(np.float32))
    src_img = torch.from_numpy(
        rng.uniform(-1, 1, (1, R, 3, S, S)).astype(np.float32))
    smpl_real_mask = torch.ones((1, T, 1, S, S))
    chosen_frame = np.asarray([[0, 9, 19, 29]])
    # precomputed rasterizer outputs (rasterization excluded; see module doc)
    src_f2pts = torch.from_numpy(
        rng.uniform(-1, 1, (1, NF, 3, 2)).astype(np.float32))
    fims = torch.from_numpy(
        rng.randint(-1, NF, (T, 1, S, S)).astype(np.int64))
    w = rng.rand(T, 1, S, S, 3).astype(np.float32)
    wims = torch.from_numpy(w / w.sum(-1, keepdims=True))

    def run_clip():
        with torch.no_grad():
            # per-part nested input lists (conv_pro_test.py:209-219)
            src_in = []
            for i in range(4):
                for j in range(6):
                    src_in.append([
                        src_texture_im[:, z, :, i * 200:(i + 1) * 200,
                                       j * 200:(j + 1) * 200]
                        for z in range(R)])
            accu_out = accu(src_in)
            union = src_mask_im[:, 0].bool()
            for z in range(1, R):
                union = union | src_mask_im[:, z].bool()
            union = union.float().unsqueeze(1).repeat(1, 3, 1, 1)
            for i in range(4):
                for j in range(6):
                    accu_out[i * 6 + j] = accu_out[i * 6 + j] * union[
                        :, :, i * 200:(i + 1) * 200, j * 200:(j + 1) * 200]
            inpaint_tex = inpaint(accu_out)
            bg_output = bg_model(bg_incomplete, S)
            tex_list = [t[0] for t in inpaint_tex]

            for i in range(T):
                src_pro = int(np.argmin(np.abs(i - chosen_frame)))
                prev_image = src_img[:, src_pro]
                warp = texture_warp_cpu(torch, tex_list,
                                        tgt_IUV255[i]).unsqueeze(0)
                refine_out, fg_mask = refine_model(warp, S)
                fusion = refine_out * fg_mask.repeat(1, 3, 1, 1) + \
                    bg_output * (1 - fg_mask.repeat(1, 3, 1, 1))
                flow = cal_bc_transform_cpu(
                    torch, src_f2pts, fims[i], wims[i], S)
                tsf = F.grid_sample(prev_image, flow, padding_mode="border",
                                    align_corners=True)
                pro = propagater({
                    "fake_tgt": fusion, "tsf_image": tsf, "use_mask": True,
                    "tgt_smpl_mask": smpl_real_mask[:, i], "use_IUV": True,
                    "tgt_IUV": tgt_IUV[i].permute(2, 0, 1).unsqueeze(0)})
                pro["pred_target"].numpy()
        return pro

    run_clip()  # warmup (allocator, conv algo selection)
    t0 = time.perf_counter()
    run_clip()
    dt = time.perf_counter() - t0
    fps = T / dt

    result = {
        "metric": "video_gen_frames_per_sec_per_chip_256px_4ref_30f",
        "value": round(fps, 3),
        "unit": "frames/s",
        "hardware": f"torch-{torch.__version__} CPU, "
                    f"{torch.get_num_threads()} threads (reference CUDA "
                    "build not runnable in this environment)",
        "clip_seconds": round(dt, 2),
        "notes": "reference torch modules composed per conv_pro_test.py:"
                 "199-279 with random weights on bench.py's synthetic "
                 "shapes; CUDA rasterizer excluded (precomputed fim/wim) — "
                 "favors this baseline, so vs_baseline is a lower bound",
    }
    with open("BENCH_BASELINE.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
