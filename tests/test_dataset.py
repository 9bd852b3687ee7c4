"""Dataset loaders against a synthetic on-disk DanceVideo-layout fixture."""

import os
import pickle

import numpy as np
import pytest

from jafpro_tpu.data.dataset import (
    face_bbox_from_iuv,
    list_clip_files,
    list_videos,
    load_clip,
    load_interval_sample,
    load_textonly_sample,
)

T_FRAMES = 6
S = 64  # small images; atlases are 4x6 of 200 => keep real 800x1200? too big
# the loaders hard-code 200px parts for atlases: write real-size atlases but
# tiny counts to keep the fixture fast.


@pytest.fixture(scope="module")
def dance_root(tmp_path_factory):
    import cv2

    rng = np.random.RandomState(0)
    root = tmp_path_factory.mktemp("dance")
    data = root / "data" / "test" / "vid_001"
    smpl = root / "smpl" / "test" / "vid_001"
    mask = root / "mask" / "test" / "vid_001"
    for d in (data, smpl, mask):
        d.mkdir(parents=True)

    for i in range(T_FRAMES):
        img = rng.randint(0, 255, (256, 256, 3), np.uint8)
        iuv = np.zeros((256, 256, 3), np.uint8)
        iuv[..., 0] = rng.randint(0, 25, (256, 256))
        iuv[100:120, 100:130, 0] = 23  # face region
        iuv[..., 1:] = rng.randint(0, 255, (256, 256, 2))
        tex = rng.randint(0, 255, (800, 1200, 3), np.uint8)
        m = (rng.rand(800, 1200) > 0.5).astype(np.uint8) * 255
        cv2.imwrite(str(data / f"frame_{i:06d}.jpg"), img)
        cv2.imwrite(str(data / f"frame_{i:06d}_IUV.png"), iuv)
        cv2.imwrite(str(data / f"frame_{i:06d}_text.png"), tex)
        cv2.imwrite(str(data / f"frame_{i:06d}_mask.png"),
                    np.repeat(m[..., None], 3, 2))
        cv2.imwrite(str(mask / f"frame_{i:06d}.png"),
                    rng.randint(0, 2, (256, 256, 3), np.uint8) * 255)

    with open(smpl / "pose_shape.pkl", "wb") as f:
        pickle.dump({
            "cams": rng.rand(T_FRAMES, 3).astype(np.float32),
            "pose": rng.rand(T_FRAMES, 72).astype(np.float32),
            "shape": rng.rand(T_FRAMES, 10).astype(np.float32),
            "vertices": rng.rand(T_FRAMES, 32, 3).astype(np.float32),
        }, f)
    return str(root)


def test_list_files_and_videos(dance_root):
    assert list_videos(os.path.join(dance_root, "data"), "test") == ["vid_001"]
    files = list_clip_files(
        os.path.join(dance_root, "data", "test", "vid_001"))
    for k in ("img", "iuv", "text", "mask"):
        assert len(files[k]) == T_FRAMES, k
    # sorted by frame number
    assert all("000000" in files[k][0] for k in files)


def test_load_clip(dance_root):
    clip = load_clip(
        os.path.join(dance_root, "data", "test"),
        os.path.join(dance_root, "smpl", "test"),
        os.path.join(dance_root, "mask", "test"),
        "vid_001", num_refs=4)
    assert clip["src_parts"].shape == (1, 4, 24, 200, 200, 3)
    assert clip["src_mask_parts"].shape == (1, 4, 24, 200, 200)
    assert clip["tgt_iuv255"].shape == (T_FRAMES, 256, 256, 3)
    assert clip["verts"].shape == (T_FRAMES, 32, 3)
    assert clip["chosen_frames"].shape == (4,)
    assert clip["src_imgs"].shape == (4, 256, 256, 3)
    # audit-log names (ref src/data.py:530-535): the clipped chosen
    # frames' image basenames, in selection order
    assert clip["chosen_names"] == [
        "frame_%06d.jpg" % f
        for f in np.clip(clip["chosen_frames"], 0, 30)]
    # uint8 wire form: image-like fields ship the decoded PNG bytes and
    # are normalized on device (train.common.normalize_batch)
    for k in ("src_parts", "src_mask_parts", "src_imgs", "tgt_iuv255",
              "smpl_mask"):
        assert clip[k].dtype == np.uint8, k
    assert "tgt_iuv" not in clip  # derived on device from tgt_iuv255
    assert clip["bg_incomplete"].dtype == np.float32  # carries noise


def test_load_textonly_sample(dance_root):
    rng = np.random.RandomState(1)
    b = load_textonly_sample(
        os.path.join(dance_root, "data", "test"), "vid_001", rng,
        num_inputs=4, num_target=2)
    assert b["src_parts"].shape == (1, 4, 24, 200, 200, 3)
    assert b["tgt_parts"].shape == (1, 2, 24, 200, 200, 3)
    assert b["tgt_mask_parts"].shape == (1, 2, 24, 200, 200)
    assert set(np.unique(b["src_mask_parts"])).issubset({0.0, 1.0})


def test_load_interval_sample(dance_root):
    rng = np.random.RandomState(2)
    b = load_interval_sample(
        os.path.join(dance_root, "data", "test"),
        os.path.join(dance_root, "smpl", "test"),
        os.path.join(dance_root, "mask", "test"),
        "vid_001", rng, num_inputs=4, num_target=1)
    assert b["src_parts"].shape == (1, 4, 24, 200, 200, 3)
    assert b["tgt_img"].shape == (1, 256, 256, 3)
    assert b["face_bbox"].shape == (1, 4)
    x0, x1, y0, y1 = b["face_bbox"][0]
    assert x1 > x0 and y1 > y0  # fixture always has a face
    assert b["src_cams"].shape == (4, 3) and b["src_verts"].shape == (4, 32, 3)
    # stage-3 mask fields (reference src/data.py:680-720)
    assert b["face_mask"].shape == (1, 256, 256, 1)
    assert b["face_mask"].max() == 1.0  # fixture always has face pixels
    assert b["src_mask_in_image"].shape == (1, 4, 256, 256)
    assert b["image_inpaint_area"].shape == (1, 256, 256)
    for k in ("face_mask", "src_mask_in_image", "image_inpaint_area"):
        assert set(np.unique(b[k])).issubset({0.0, 1.0}), k


def test_transfer_texture_reference_semantics():
    """Nearest-neighbor atlas->image warp matches the reference
    TransferTexture indexing (src/utils.py:369-394): tex[U, 199-V] of the
    part's 200px tile."""
    from jafpro_tpu.data.texture import transfer_texture

    atlas = np.zeros((800, 1200, 3), np.float32)
    # part 8 -> grid row (8-1)//6 = 1, col 8-1-6 = 1
    atlas[200:400, 200:400] = np.arange(
        200 * 200 * 3, dtype=np.float32).reshape(200, 200, 3)
    iuv = np.zeros((4, 4, 3), np.float32)
    iuv[1, 2] = [8, 255, 0]    # U=255 -> u=199; V=0 -> col 199
    iuv[3, 0] = [8, 0, 255]    # U=0 -> u=0;    V=255 -> col 0
    out = transfer_texture(atlas, iuv)
    np.testing.assert_array_equal(out[1, 2], atlas[200 + 199, 200 + 199])
    np.testing.assert_array_equal(out[3, 0], atlas[200 + 0, 200 + 0])
    assert (out[0, 0] == 0).all()  # background untouched


def test_face_bbox_margins():
    iuv = np.zeros((256, 256, 3), np.float32)
    iuv[50:60, 70:80, 0] = 23
    bb = face_bbox_from_iuv(iuv)
    np.testing.assert_array_equal(bb, [68, 82, 48, 62])
    assert (face_bbox_from_iuv(np.zeros((256, 256, 3))) == 0).all()


def test_pack_dancevideo_roundtrip(dance_root, tmp_path):
    from jafpro_tpu.data.shardio import (
        ShardReader, interval_spec, pack_dancevideo)

    n = pack_dancevideo(
        os.path.join(dance_root, "data"),
        os.path.join(dance_root, "smpl"),
        os.path.join(dance_root, "mask"),
        str(tmp_path), mode="test", samples_per_video=2, num_refs=4,
        num_verts=32)
    assert n == 2
    spec = interval_spec(num_refs=4, num_verts=32)
    r = ShardReader(spec, [str(tmp_path / "test-interval-00000.shard")], batch=2,
                    shuffle=False, loop=False, threads=1)
    b = next(r)
    assert b["src_parts"].shape == (2, 4, 24, 200, 200, 3)
    assert b["tgt_verts"].shape == (2, 1, 32, 3)
    assert np.isfinite(b["src_parts"]).all()
    r.close()


def test_sample_frame_indices_reference_branches():
    """fix_frame=False / self_recon=True must change sampled frames exactly
    the way the reference's branches do (``src/data.py:41-63``)."""
    from jafpro_tpu.data.dataset import sample_frame_indices

    T, num_inputs, num_target = 40, 4, 3

    # default mode: all indices distinct, no augmentation
    rng = np.random.RandomState(0)
    f = sample_frame_indices(T, rng, num_inputs, num_target)
    assert len(set(f.tolist())) == f.size

    # fix_frame=False: replicate the reference's exact branch with a
    # same-seeded rng consuming the same call sequence (choice, then one
    # random_sample)
    dup_both = dup_one = none = 0
    for seed in range(300):
        ref_rng = np.random.RandomState(seed)
        base = ref_rng.choice(T, num_inputs + num_target, replace=False)
        r = ref_rng.random_sample()
        expect = base.copy()
        if r < 0.33333:
            expect[1 + num_target] = expect[num_target]
            expect[2 + num_target] = expect[num_target]
            dup_both += 1
        elif r < 0.66666:
            expect[1 + num_target] = expect[num_target]
            dup_one += 1
        else:
            none += 1
        got = sample_frame_indices(
            T, np.random.RandomState(seed), num_inputs, num_target,
            fix_frame=False)
        assert np.array_equal(got, expect), seed
    # all three branches exercised at roughly 1/3 each
    assert min(dup_both, dup_one, none) > 60

    # self_recon=True: with prob 0.3 one of the first num_inputs slots is
    # overwritten with source 0's frame (the fix_frame draw still happens
    # first — same stream as the implementation)
    hits = 0
    for seed in range(300):
        ref_rng = np.random.RandomState(seed)
        base = ref_rng.choice(T, num_inputs + num_target, replace=False)
        ref_rng.random_sample()  # the (unused) fix_frame draw
        expect = base.copy()
        if ref_rng.random_sample() < 0.3:
            idx = ref_rng.choice(num_inputs, 1)
            expect[idx] = expect[num_target]
            hits += 1
        got = sample_frame_indices(
            T, np.random.RandomState(seed), num_inputs, num_target,
            self_recon=True)
        assert np.array_equal(got, expect), seed
    assert 50 < hits < 130  # ~30% of 300


def test_load_textonly_sample_respects_sampling_flags(dance_root):
    """The loader must thread fix_frame/self_recon into the index sampler:
    with fix_frame=False and a seed hitting the duplicate-both branch, the
    first three reference parts stacks are identical."""
    for seed in range(50):
        probe = np.random.RandomState(seed)
        probe.choice(T_FRAMES, 4 + 2, replace=False)
        if probe.random_sample() < 0.33333:
            break
    else:
        pytest.skip("no seed hit the duplicate branch")
    s = load_textonly_sample(
        os.path.join(dance_root, "data", "test"), "vid_001",
        np.random.RandomState(seed), num_inputs=4, num_target=2,
        fix_frame=False)
    src = s["src_parts"][0]
    assert np.array_equal(src[0], src[1])
    assert np.array_equal(src[0], src[2])
