"""Native packed-shard reader: pack/read roundtrip, shuffling, prefetch."""

import os

import numpy as np
import pytest

from jafpro_tpu.data import shardio


SPEC = [
    ("img", (4, 4, 3), "float32"),
    ("label", (2,), "int32"),
]


@pytest.fixture(scope="module")
def shard(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    rng = np.random.RandomState(0)
    samples = [
        {"img": rng.randn(4, 4, 3).astype(np.float32),
         "label": np.asarray([i, i * 2], np.int32)}
        for i in range(10)
    ]
    path = str(d / "train-00000.shard")
    n = shardio.pack_shard(SPEC, samples, path)
    assert n == 10
    return path, samples


def test_roundtrip_ordered(shard):
    path, samples = shard
    r = shardio.ShardReader(SPEC, [path], batch=2, shuffle=False, loop=False,
                            threads=1, prefetch=1)
    assert r.num_records == 10
    seen = []
    for batch in r:
        assert batch["img"].shape == (2, 4, 4, 3)
        seen.extend(batch["label"][:, 0].tolist())
        if len(seen) >= 10:
            break
    r.close()
    # single thread, no shuffle -> in order
    assert seen[:10] == list(range(10))
    np.testing.assert_allclose(samples[1]["img"],
                               np.asarray(samples[1]["img"]))


def test_shuffled_epoch_covers_all(shard):
    path, _ = shard
    r = shardio.ShardReader(SPEC, [path], batch=5, shuffle=True, loop=True,
                            threads=1, prefetch=2, seed=7)
    labels = []
    for _ in range(2):
        batch = next(r)
        labels.extend(batch["label"][:, 0].tolist())
    r.close()
    assert sorted(labels) == list(range(10))
    assert labels != list(range(10))  # actually shuffled


def test_epochs_reshuffled(shard):
    """Consecutive epochs must visit records in different orders (the
    reference DataLoader's shuffle=True semantics, train/4:199)."""
    path, _ = shard
    r = shardio.ShardReader(SPEC, [path], batch=5, shuffle=True, loop=True,
                            threads=1, prefetch=1, seed=3)
    epochs = []
    for _ in range(3):
        labels = []
        while len(labels) < 10:
            labels.extend(next(r)["label"][:, 0].tolist())
        epochs.append(labels)
    r.close()
    for e in epochs:
        assert sorted(e) == list(range(10))  # each epoch covers all records
    assert epochs[0] != epochs[1] or epochs[1] != epochs[2]
    assert epochs[0] != epochs[1]  # 10! orders — collision ~0


def test_content_integrity(shard):
    path, samples = shard
    r = shardio.ShardReader(SPEC, [path], batch=1, shuffle=False, loop=True,
                            threads=1, prefetch=1)
    for i in range(3):
        batch = next(r)
        np.testing.assert_allclose(batch["img"][0], samples[i]["img"])
        np.testing.assert_array_equal(batch["label"][0], samples[i]["label"])
    r.close()


def test_uint8_wire_format_roundtrip_exact():
    """The uint8 shard encoding must be bit-exact for PNG-derived values:
    loaders compute u/255*2-1 (textures/images) and u/255 (masks); encode
    (shardio.encode_field_u8) then device-decode (train.common
    .normalize_batch) must reproduce the float32 field exactly."""
    import jax.numpy as jnp

    from jafpro_tpu.train.common import normalize_batch

    u = np.arange(256, dtype=np.uint8)
    img_f = u.astype(np.float32) / 255.0 * 2.0 - 1.0
    mask_f = u.astype(np.float32) / 255.0
    enc_img = shardio.encode_field_u8("src_parts", img_f)
    enc_mask = shardio.encode_field_u8("src_mask_parts", mask_f)
    np.testing.assert_array_equal(enc_img, u)
    np.testing.assert_array_equal(enc_mask, u)

    out = normalize_batch({
        "src_parts": jnp.asarray(enc_img),
        "src_mask_parts": jnp.asarray(enc_mask),
        "tgt_iuv255": jnp.asarray(u),
    })
    np.testing.assert_array_equal(np.asarray(out["src_parts"]), img_f)
    np.testing.assert_array_equal(np.asarray(out["src_mask_parts"]), mask_f)
    np.testing.assert_array_equal(np.asarray(out["tgt_iuv255"]),
                                  u.astype(np.float32))
    # tgt_iuv is derived on device, not stored
    np.testing.assert_array_equal(
        np.asarray(out["tgt_iuv"]),
        (u.astype(np.float32) / 255.0 - 0.5) * 2.0)


def test_normalize_batch_float_passthrough():
    """float32 batches (synthetic/tests/per-sample loads) are untouched."""
    import jax.numpy as jnp

    from jafpro_tpu.train.common import normalize_batch

    b = {"src_parts": jnp.linspace(-1, 1, 7, dtype=jnp.float32),
         "tgt_iuv": jnp.zeros((3,), jnp.float32)}
    out = normalize_batch(b)
    assert out["src_parts"] is b["src_parts"]
    assert out["tgt_iuv"] is b["tgt_iuv"]


def test_stale_float32_shard_rejected(tmp_path):
    """A shard packed under a different record layout (e.g. the old float32
    wire format) must be rejected loudly, not read as garbage."""
    spec = [("x", (3,), "uint8")]
    path = str(tmp_path / "bad.shard")
    with open(path, "wb") as f:
        f.write(b"\x00" * 7)  # not a multiple of the 3-byte record
    with pytest.raises(IOError, match="different spec"):
        shardio.ShardReader(spec, [path], batch=1)


def test_spec_hash_header_rejects_wrong_spec(tmp_path):
    """ADVICE r4 (medium): a stale shard whose old record size happens to
    divide the file (float32 record = 4x the uint8 one) must be refused by
    the spec-hash header, not silently read as garbage pixels."""
    old_spec = [("x", (3,), "float32")]   # 12-byte record
    new_spec = [("x", (3,), "uint8")]     # 3-byte record: divides 12
    path = str(tmp_path / "old.shard")
    shardio.pack_shard(
        old_spec, [{"x": np.zeros(3, np.float32)} for _ in range(4)], path)
    # sanity: payload IS a multiple of the new record size — only the
    # header catches this
    assert (os.path.getsize(path) - shardio.HEADER_BYTES) % 3 == 0
    with pytest.raises(IOError, match="spec hash"):
        shardio.ShardReader(new_spec, [path], batch=1)
    # and the matching spec still opens fine
    r = shardio.ShardReader(old_spec, [path], batch=2, shuffle=False,
                            loop=False, threads=1, prefetch=1)
    assert r.num_records == 4
    np.testing.assert_array_equal(next(r)["x"], np.zeros((2, 3), np.float32))
    r.close()


def test_headerless_legacy_shard_still_reads(tmp_path):
    """Files packed before the header existed (raw records) keep working
    through the size-divisibility fallback."""
    spec = [("x", (2,), "int32")]
    path = str(tmp_path / "legacy.shard")
    with open(path, "wb") as f:  # raw records, no header
        for i in range(5):
            f.write(np.asarray([i, -i], np.int32).tobytes())
    r = shardio.ShardReader(spec, [path], batch=1, shuffle=False,
                            loop=False, threads=1, prefetch=1)
    assert r.num_records == 5
    np.testing.assert_array_equal(next(r)["x"][0], [0, 0])
    np.testing.assert_array_equal(next(r)["x"][0], [1, -1])
    r.close()


def test_encode_field_u8_saturates_out_of_range():
    """ADVICE r4 (low): out-of-range floats must saturate, not wrap."""
    v = np.asarray([-1.5, -1.0, 0.0, 1.0, 1.7], np.float32)
    enc = shardio.encode_field_u8("src_parts", v)  # symmetric (-1,1)
    np.testing.assert_array_equal(enc, [0, 0, 128, 255, 255])
    m = np.asarray([-0.2, 0.0, 1.0, 1.3], np.float32)
    np.testing.assert_array_equal(
        shardio.encode_field_u8("smpl_mask", m), [0, 0, 255, 255])
    raw = np.asarray([-3.0, 0.0, 255.0, 300.0], np.float32)
    np.testing.assert_array_equal(
        shardio.encode_field_u8("tgt_iuv255", raw), [0, 0, 255, 255])


def test_clip_pack_roundtrip_matches_load_clip(tmp_path):
    """pack --kind clips: the ClipPackReader must return exactly what
    load_clip assembles (the u8 fields are already u8 at the loader, so
    the round-trip is bit-exact; float fields are stored verbatim)."""
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    from make_fixture import write_fixture

    from jafpro_tpu.data.dataset import list_videos, load_clip

    fx = str(tmp_path / "fx")
    write_fixture(fx, vids_per_mode=2, frames=4, seed=3)
    data = os.path.join(fx, "data")
    smpl = os.path.join(fx, "smpl")
    mask = os.path.join(fx, "mask")
    out = str(tmp_path / "clip_pack")
    n = shardio.pack_test_clips(data, smpl, mask, out, mode="test",
                                num_refs=2)
    vids = list_videos(data, "test")
    assert n == len(vids)

    r = shardio.ClipPackReader(out)
    assert r.vids == vids
    for i, vid in enumerate(vids):
        want = load_clip(os.path.join(data, "test"),
                         os.path.join(smpl, "test"),
                         os.path.join(mask, "test"), vid, num_refs=2)
        got = r.load(i)
        assert got["vid_name"] == vid
        assert got["chosen_names"] == list(want["chosen_names"])
        for k in ("src_parts", "src_mask_parts", "src_imgs", "tgt_iuv255",
                  "smpl_mask", "chosen_frames", "ref_mask"):
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(want[k]), err_msg=k)
            assert got[k].dtype == np.asarray(want[k]).dtype, k
        for k in ("bg_incomplete", "cams", "verts"):
            np.testing.assert_allclose(
                got[k], np.asarray(want[k], np.float32), err_msg=k)
