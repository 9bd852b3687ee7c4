"""Measure the PyTorch reference's stage-4 TRAINING throughput and record
it as BENCH_TRAIN_BASELINE.json (the denominator of bench_train.py's
``vs_baseline``).

Composes one full stage-4 optimization step from the reference's *own*
torch modules exactly as ``train/4.convLSTM_flowpro_interval.py:202-413``
does: zero-grads -> per-part accumulate (Accumulate_LSTM_no_loss) ->
union-mask -> UNet_inpainter -> per-sample 24-part texture warp ->
CRN refine -> frozen-bg CRN + fusion -> barycentric flow warp ->
Propagation3DFlowNet -> VGG_l1_loss -> face-crop FaceDiscriminator step
(x1) -> ImageDiscriminator steps (x3) -> generator backward
(total = vgg_l1 + 2*errG + 2*F_errG, train/4:407) -> 4 Adam steps
(accu/inpaint/refine/flow at the fine-tune lrs, train/4:169-175).

Shapes match bench_train.py: batch 4, all 4 references (the most
expensive arm of the train/4:249-267 curriculum — the same work the TPU
bench's synthetic batch does), 256px frames, 24x200x200 parts, 13776
faces.

Hardware caveats (all favor the BASELINE, making vs_baseline
conservative): torch CPU (no NVIDIA GPU exists in this environment; the
reference's CUDA build cannot run); the CUDA rasterizer inside
``float_estimate`` is EXCLUDED (fim/wim precomputed — the TPU training
step pays for its two per-step rasterizations); torchvision is absent,
so VGG19_CRN's backbone is an architecture-identical random-weight
torch VGG19 features stack (same FLOPs; pretrained weights change
numbers, not time).
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

import numpy as np

REF = "/root/reference"


def _stub_torchvision_with_vgg19():
    """Install a torchvision stub whose ``vgg19(pretrained=True)`` returns
    an architecture-exact random-weight torch module (the standard VGG19
    ``features`` indexing that VGG19_CRN's mp_list/extracted_layers assume,
    src/networks.py:70-93)."""
    import torch.nn as nn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]

    def make_features():
        layers, c_in = [], 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
            else:
                layers.append(nn.Conv2d(c_in, v, kernel_size=3, padding=1))
                layers.append(nn.ReLU(inplace=True))
                c_in = v
        return nn.Sequential(*layers)

    def vgg19(pretrained=False, **kw):
        m = types.SimpleNamespace()
        m.features = make_features()
        return m

    tv = types.ModuleType("torchvision")
    tv.models = types.ModuleType("torchvision.models")
    tv.models.vgg19 = vgg19
    tv.models.vgg16 = None
    tv.transforms = types.ModuleType("torchvision.transforms")
    tv.transforms.functional = types.ModuleType(
        "torchvision.transforms.functional")
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv.models
    sys.modules["torchvision.transforms"] = tv.transforms
    sys.modules["torchvision.transforms.functional"] = \
        tv.transforms.functional


def main():
    import torch  # noqa: E402  (before the stub builds nn layers)

    _stub_torchvision_with_vgg19()
    sys.path.insert(0, REF)
    from bench_baseline import (_patch_lstm_cpu, cal_bc_transform_cpu,
                                texture_warp_cpu)
    import src.convLSTM as conv_lstm
    from src.crn_model import CRN_smaller
    from src.flow_net import Propagation3DFlowNet
    from src.networks import (Accumulate_LSTM_no_loss, FaceDiscriminator,
                              ImageDiscriminator, UNet_inpainter,
                              VGG_l1_loss)

    F = torch.nn.functional
    torch.manual_seed(0)
    R, S, p, NF = 4, 256, 200, 13776
    B = int(os.environ.get("BENCH_B", "4"))  # BENCH_B=1: correctness smoke

    accu = Accumulate_LSTM_no_loss().train()
    _patch_lstm_cpu(conv_lstm, accu)
    inpaint = UNet_inpainter().train()
    bg_model = CRN_smaller(3).eval()            # frozen, train/4:187
    refine_model = CRN_smaller(3, fg=True).train()
    propagater = Propagation3DFlowNet(9, 32, 2, 3, use_deconv=False).train()
    discriminator = ImageDiscriminator(ndf=32, input_channel=6).train()
    f_discriminator = FaceDiscriminator(ndf=32, input_channel=6).train()

    from torch.optim import Adam
    opt_accu = Adam(accu.parameters(), lr=1e-5)        # train/4:169-175
    opt_inpaint = Adam(inpaint.parameters(), lr=1e-5)
    opt_refine = Adam(refine_model.parameters(), lr=1e-5)
    opt_flow = Adam(propagater.parameters(), lr=5e-5)
    opt_d = Adam(discriminator.parameters(), lr=3e-6)
    opt_face = Adam(f_discriminator.parameters(), lr=1e-6)
    gan_criterion = torch.nn.BCELoss()
    loss_criterion = VGG_l1_loss()

    rng = np.random.RandomState(0)
    src_texture_im = torch.from_numpy(
        rng.uniform(-1, 1, (B, R, 3, 800, 1200)).astype(np.float32))
    src_mask_im = torch.from_numpy(
        (rng.rand(B, R, 800, 1200) > 0.5).astype(np.float32))
    iuv = np.zeros((B, S, S, 3), np.float32)
    iuv[..., 0] = rng.randint(0, 25, (B, S, S))
    iuv[..., 1:] = rng.randint(0, 256, (B, S, S, 2))
    tgt_iuv255 = torch.from_numpy(iuv)
    tgt_iuv = ((tgt_iuv255 / 255.0 - 0.5) * 2.0).permute(0, 3, 1, 2)
    bg_incomplete = torch.from_numpy(
        rng.uniform(-1, 1, (B, 3, S, S)).astype(np.float32))
    src_img0 = torch.from_numpy(
        rng.uniform(-1, 1, (B, 3, S, S)).astype(np.float32))
    prev_real_img = torch.from_numpy(
        rng.uniform(-1, 1, (B, 3, S, S)).astype(np.float32))
    tgt_img = torch.from_numpy(
        rng.uniform(-1, 1, (B, 3, S, S)).astype(np.float32))
    smpl_real_mask = torch.ones((B, 1, S, S))
    # precomputed rasterizer outputs (rasterization excluded; module doc)
    src_f2pts = torch.from_numpy(
        rng.uniform(-1, 1, (B, NF, 3, 2)).astype(np.float32))
    fims = torch.from_numpy(
        rng.randint(-1, NF, (B, S, S)).astype(np.int64))
    w = rng.rand(B, S, S, 3).astype(np.float32)
    wims = torch.from_numpy(w / w.sum(-1, keepdims=True))
    # fixed valid face bboxes (cols 96:160, rows 96:160) — the reference's
    # are data-dependent (train/4:334-353); fixed size changes no FLOPs
    fx0, fx1, fy0, fy1 = 96, 160, 96, 160

    def run_step():
        opt_accu.zero_grad(); opt_inpaint.zero_grad()
        opt_refine.zero_grad(); opt_flow.zero_grad()
        opt_d.zero_grad(); opt_face.zero_grad()

        # all-4-refs curriculum arm (train/4:259-261)
        src_in = []
        for i in range(4):
            for j in range(6):
                src_in.append([
                    src_texture_im[:, z, :, i * 200:(i + 1) * 200,
                                   j * 200:(j + 1) * 200] for z in range(R)])
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

        inpaint_warp = torch.zeros((B, 3, S, S))
        for i in range(B):
            tex_list = [t[i] for t in inpaint_tex]
            inpaint_warp[i] = texture_warp_cpu(torch, tex_list,
                                               tgt_iuv255[i])
        refine_out, fg_mask = refine_model(inpaint_warp, S)
        with torch.no_grad():
            bg_out = bg_model(bg_incomplete, S)
        fusion = refine_out * fg_mask.repeat(1, 3, 1, 1) + \
            bg_out * (1 - fg_mask.repeat(1, 3, 1, 1))

        flow = cal_bc_transform_cpu(torch, src_f2pts, fims, wims, S)
        tsf = F.grid_sample(prev_real_img, flow, padding_mode="border",
                            align_corners=True)
        pro = propagater({"fake_tgt": fusion, "tsf_image": tsf,
                          "use_mask": True, "tgt_smpl_mask": smpl_real_mask,
                          "tgt_IUV": tgt_iuv, "use_IUV": True})
        final = pro["pred_target"]
        loss = loss_criterion(final, tgt_img)

        face_pred = F.interpolate(final[:, :, fy0:fy1, fx0:fx1],
                                  size=(64, 64), mode="bilinear")
        face_real = F.interpolate(tgt_img[:, :, fy0:fy1, fx0:fx1],
                                  size=(64, 64), mode="bilinear")
        face_iuv = F.interpolate(tgt_iuv[:, :, fy0:fy1, fx0:fx1],
                                 size=(64, 64), mode="nearest")

        # face D x1 (train/4:357-374)
        pred_real = f_discriminator(torch.cat([face_real, face_iuv], 1))
        gan_criterion(pred_real, torch.full_like(pred_real, 1.0)).backward()
        pred_fake = f_discriminator(
            torch.cat([face_pred.detach(), face_iuv], 1))
        gan_criterion(pred_fake, torch.full_like(pred_fake, 0.0)).backward()
        opt_face.step()

        # image D x3 (train/4:376-394)
        for _ in range(3):
            pred_real = discriminator(torch.cat([tgt_img, src_img0], 1))
            gan_criterion(pred_real,
                          torch.full_like(pred_real, 1.0)).backward()
            pred_fake = discriminator(
                torch.cat([final.detach(), src_img0], 1))
            gan_criterion(pred_fake,
                          torch.full_like(pred_fake, 0.0)).backward()
            opt_d.step()

        # generator (train/4:396-413; generator_face input detached :397)
        gen_pred = discriminator(torch.cat([final, src_img0], 1))
        gen_face = f_discriminator(
            torch.cat([face_pred.detach(), face_iuv], 1))
        err_g = gan_criterion(gen_pred, torch.full_like(gen_pred, 1.0))
        f_err_g = gan_criterion(gen_face, torch.full_like(gen_face, 1.0))
        total = loss.sum() + 2 * err_g + 2 * f_err_g
        total.backward()
        opt_accu.step(); opt_inpaint.step()
        opt_refine.step(); opt_flow.step()
        return float(total.detach())

    run_step()  # warmup (allocator, conv algo selection)
    n = int(os.environ.get("BENCH_ITERS", "2"))
    t0 = time.perf_counter()
    for _ in range(n):
        run_step()
    dt = (time.perf_counter() - t0) / n

    result = {
        "metric": f"stage4_train_iters_per_sec_batch{B}_256px",
        "value": round(1.0 / dt, 4),
        "unit": "iters/s",
        "hardware": f"torch-{torch.__version__} CPU, "
                    f"{torch.get_num_threads()} threads (reference CUDA "
                    "build not runnable in this environment)",
        "iter_seconds": round(dt, 2),
        "notes": "reference torch modules composed per train/4.convLSTM_"
                 f"flowpro_interval.py:202-413 with random weights on "
                 f"bench_train.py's shapes (batch {B}, 4 refs). The "
                 "rasterizer-excluded (precomputed fim/wim) scoping favors "
                 "this baseline, so that exclusion alone makes vs_baseline "
                 "conservative; the ratio itself is CPU-vs-TPU "
                 "hardware-confounded (torch CUDA is not runnable here) and "
                 "must not be read as a framework-vs-framework speedup",
    }
    if B == 4:  # only the reference's batch-4 config is the baseline
        with open("BENCH_TRAIN_BASELINE.json", "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
