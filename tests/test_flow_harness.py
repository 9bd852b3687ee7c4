"""FlowNet standalone trainer: loss decreases on a fixed synthetic batch."""

import numpy as np
import jax

from jafpro_tpu.train.flow_harness import (
    make_flow_train_step, synthetic_flow_batch)


def test_flow_harness_sd_loss_decreases():
    rng = np.random.RandomState(0)
    pairs, flow = synthetic_flow_batch(rng, batch=1, size=64)
    init_fn, step_fn = make_flow_train_step("sd", lr=3e-4)
    state = init_fn(jax.random.PRNGKey(0), pairs)
    losses = []
    for _ in range(8):
        state, m = step_fn(state, pairs, flow)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    # Adam warmup + train-mode BN make the first steps noisy; require net
    # improvement by the end
    assert losses[-1] < max(losses[:2])


# ---------------------------------------------------------------------------
# dataset loaders (reference src/flownet2_pytorch/datasets.py layouts)
# ---------------------------------------------------------------------------

def _write_img(path, rng, h=96, w=128):
    import cv2

    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(path), img)
    return img


def test_flo_round_trip(tmp_path):
    from jafpro_tpu.data.flow_datasets import read_flo, write_flo

    rng = np.random.RandomState(0)
    flow = rng.randn(9, 13, 2).astype(np.float32)
    p = tmp_path / "a.flo"
    write_flo(str(p), flow)
    np.testing.assert_array_equal(read_flo(str(p)), flow)


def test_flying_chairs_layout(tmp_path):
    from jafpro_tpu.data.flow_datasets import (
        FlowPairSource, index_flying_chairs, make_source, write_flo)

    rng = np.random.RandomState(1)
    for i in range(3):
        _write_img(tmp_path / f"{i:05d}_img1.ppm", rng)
        _write_img(tmp_path / f"{i:05d}_img2.ppm", rng)
        write_flo(str(tmp_path / f"{i:05d}_flow.flo"),
                  rng.randn(96, 128, 2).astype(np.float32))
    pairs, flows = index_flying_chairs(str(tmp_path))
    assert len(pairs) == len(flows) == 3
    assert pairs[0][0].endswith("00000_img1.ppm")
    assert pairs[0][1].endswith("00000_img2.ppm")

    src = make_source("FlyingChairs", str(tmp_path), crop_size=(64, 64))
    xs, ys = src.sample_batch(rng, batch=2)
    assert xs.shape == (2, 64, 64, 6) and ys.shape == (2, 64, 64, 2)
    assert xs.dtype == np.float32 and 0.0 <= xs.min() and xs.max() <= 1.0


def test_mpi_sintel_layout_skips_incomplete(tmp_path):
    from jafpro_tpu.data.flow_datasets import index_mpi_sintel, write_flo

    rng = np.random.RandomState(2)
    (tmp_path / "flow" / "alley_1").mkdir(parents=True)
    (tmp_path / "clean" / "alley_1").mkdir(parents=True)
    for n in (1, 2, 3):
        write_flo(str(tmp_path / "flow" / "alley_1" / f"frame_{n:04d}.flo"),
                  rng.randn(8, 8, 2).astype(np.float32))
    # frames 1..3 exist -> flows 1 and 2 have successor images; flow 3 not
    for n in (1, 2, 3):
        _write_img(tmp_path / "clean" / "alley_1" / f"frame_{n:04d}.png",
                   rng, 8, 8)
    pairs, flows = index_mpi_sintel(str(tmp_path), "clean")
    assert len(pairs) == 2
    assert flows[0].endswith("frame_0001.flo")


def test_chairs_sdhom_flips_flow(tmp_path):
    from jafpro_tpu.data.flow_datasets import make_source, read_flo, write_flo

    rng = np.random.RandomState(3)
    for sub in ("t0", "t1", "flow"):
        (tmp_path / "train" / sub).mkdir(parents=True)
    _write_img(tmp_path / "train" / "t0" / "0.png", rng, 16, 16)
    _write_img(tmp_path / "train" / "t1" / "0.png", rng, 16, 16)
    flow = rng.randn(16, 16, 2).astype(np.float32)
    write_flo(str(tmp_path / "train" / "flow" / "0.flo"), flow)

    src = make_source("ChairsSDHomTrain", str(tmp_path), crop_size=(16, 16),
                      random_crop=False)
    _, ys = src.sample_batch(rng, batch=1)
    # the reference loads ChairsSDHom flow upside-down (datasets.py:289)
    np.testing.assert_array_equal(ys[0], flow[::-1])


def test_images_from_folder(tmp_path):
    from jafpro_tpu.data.flow_datasets import index_images_from_folder

    rng = np.random.RandomState(4)
    for i in range(4):
        _write_img(tmp_path / f"f{i}.png", rng, 8, 8)
    pairs = index_images_from_folder(str(tmp_path))
    assert len(pairs) == 3
    assert pairs[1][0].endswith("f1.png") and pairs[1][1].endswith("f2.png")


def test_flow_harness_resume_and_bf16(tmp_path):
    from jafpro_tpu.train.flow_harness import (
        restore_flow_state, save_flow_state)

    rng = np.random.RandomState(5)
    pairs, flow = synthetic_flow_batch(rng, batch=1, size=64)
    init_fn, step_fn = make_flow_train_step("sd", lr=3e-4,
                                            compute_dtype="bfloat16")
    state = init_fn(jax.random.PRNGKey(0), pairs)
    state, m = step_fn(state, pairs, flow)
    assert np.isfinite(float(m["loss"]))

    save_flow_state(str(tmp_path / "ck"), 1, state)
    blank = jax.tree_util.tree_map(np.zeros_like, state)
    restored, start = restore_flow_state(str(tmp_path / "ck"), blank)
    assert start == 1
    for a, b in zip(jax.tree_util.tree_leaves(restored["params"]),
                    jax.tree_util.tree_leaves(state["params"]),
                    strict=True):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
