"""Native packed-shard reader: pack/read roundtrip, shuffling, prefetch."""

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
