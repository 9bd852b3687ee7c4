"""Packed-shard input pipeline (ctypes binding of native/shardio.cc).

The reference re-decodes PNG/JPEG per sample in DataLoader workers —
including 800x1200 atlases (``src/data.py:656-676``) — which cannot feed a
TPU at device speed.  Here clips are packed once into fixed-size binary
records; the C++ reader streams prefetched, batch-assembled buffers with
zero Python in the hot loop.

A record layout is declared by a spec: ordered (name, shape, dtype) fields.
``pack_shard`` writes records; ``ShardReader`` yields batch dicts of numpy
arrays backed by one contiguous buffer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

Spec = Sequence[Tuple[str, Tuple[int, ...], str]]

_LIB: Optional[ctypes.CDLL] = None


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def build_library(force: bool = False) -> str:
    """Compile native/shardio.cc -> libshardio.so (cached)."""
    nd = _native_dir()
    src = os.path.join(nd, "shardio.cc")
    out = os.path.join(nd, "libshardio.so")
    if force or (not os.path.exists(out)) or (
            os.path.getmtime(out) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
             src, "-o", out],
            check=True)
    return out


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(build_library())
        lib.shardio_open.restype = ctypes.c_void_p
        lib.shardio_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_uint64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
            ctypes.c_int, ctypes.c_int]
        lib.shardio_next.restype = ctypes.c_int64
        lib.shardio_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.shardio_num_records.restype = ctypes.c_int64
        lib.shardio_num_records.argtypes = [ctypes.c_void_p]
        lib.shardio_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def record_bytes(spec: Spec) -> int:
    total = 0
    for _, shape, dtype in spec:
        total += int(np.prod(shape)) * np.dtype(dtype).itemsize
    return total


def pack_record(spec: Spec, sample: Dict[str, np.ndarray]) -> bytes:
    parts = []
    for name, shape, dtype in spec:
        arr = np.ascontiguousarray(sample[name], dtype=dtype)
        if arr.shape != tuple(shape):
            raise ValueError(f"{name}: {arr.shape} != {tuple(shape)}")
        parts.append(arr.tobytes())
    return b"".join(parts)


def pack_shard(spec: Spec, samples, path: str) -> int:
    """Write an iterable of sample dicts to one shard file; returns count."""
    n = 0
    with open(path, "wb") as f:
        for s in samples:
            f.write(pack_record(spec, s))
            n += 1
    return n


def unpack_batch(spec: Spec, buf: np.ndarray, batch: int) -> Dict[str, np.ndarray]:
    out = {}
    offset = 0
    rb = record_bytes(spec)
    mat = buf.reshape(batch, rb)
    for name, shape, dtype in spec:
        nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
        field = mat[:, offset:offset + nbytes]
        out[name] = np.ascontiguousarray(field).view(dtype).reshape(
            (batch,) + tuple(shape))
        offset += nbytes
    return out


class ShardReader:
    """Iterate batches from packed shards with native prefetch."""

    def __init__(self, spec: Spec, paths: List[str], batch: int = 1,
                 prefetch: int = 2, threads: int = 2, seed: int = 0,
                 shuffle: bool = True, loop: bool = True):
        self.spec = list(spec)
        self.batch = batch
        self.rb = record_bytes(spec)
        lib = _lib()
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._h = lib.shardio_open(
            arr, len(paths), self.rb, batch, prefetch, threads, seed,
            int(shuffle), int(loop))
        if not self._h:
            raise IOError(f"shardio_open failed for {paths}")
        self.num_records = int(lib.shardio_num_records(self._h))
        self._buf = np.empty(self.rb * batch, np.uint8)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        idx = _lib().shardio_next(
            self._h, self._buf.ctypes.data_as(ctypes.c_void_p))
        if idx < 0:
            raise StopIteration
        return unpack_batch(self.spec, self._buf, self.batch)

    def close(self):
        if self._h:
            _lib().shardio_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


# ---------------------------------------------------------------------------
# DanceVideo -> packed shards
# ---------------------------------------------------------------------------

def interval_spec(num_refs: int = 4, image_size: int = 256,
                  part_size: int = 200, num_parts: int = 24,
                  num_verts: int = 6890) -> Spec:
    """Record layout for stage-3/4 training samples."""
    S, p, P, R = image_size, part_size, num_parts, num_refs
    return [
        ("src_parts", (R, P, p, p, 3), "float32"),
        ("src_mask_parts", (R, P, p, p), "float32"),
        ("tgt_iuv255", (1, S, S, 3), "float32"),
        ("tgt_iuv", (1, S, S, 3), "float32"),
        ("tgt_img", (1, S, S, 3), "float32"),
        ("src_img_first", (1, S, S, 3), "float32"),
        ("src_imgs", (R, S, S, 3), "float32"),
        ("bg_incomplete", (1, S, S, 3), "float32"),
        ("smpl_mask", (1, S, S, 1), "float32"),
        ("face_bbox", (1, 4), "float32"),
        ("src_cams", (R, 3), "float32"),
        ("src_verts", (R, num_verts, 3), "float32"),
        ("tgt_cam", (1, 3), "float32"),
        ("tgt_verts", (1, num_verts, 3), "float32"),
    ]


# interval-record fields stored with a leading singleton target dim; the
# training-step contract is (B, ...) for these (the per-sample loader path
# gets there by concatenating the (1, ...) samples)
_SINGLE_TARGET_FIELDS = frozenset({
    "tgt_iuv255", "tgt_iuv", "tgt_img", "src_img_first", "bg_incomplete",
    "smpl_mask", "face_bbox", "tgt_cam", "tgt_verts"})


def collapse_target_dims(spec: Spec, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Merge each record's singleton target dim into the batch dim (the
    fields in ``_SINGLE_TARGET_FIELDS``); per-reference (R, ...) and
    multi-target (T, ...) fields keep their axis."""
    out = {}
    for name, shape, _ in spec:
        v = batch[name]
        if name in _SINGLE_TARGET_FIELDS:
            v = v.reshape((v.shape[0],) + tuple(shape)[1:])
        out[name] = v
    return out


def textonly_spec(num_refs: int = 4, num_target: int = 3,
                  part_size: int = 200, num_parts: int = 24) -> Spec:
    """Record layout for stage-1/2 (texture-only) training samples."""
    p, P, R, T = part_size, num_parts, num_refs, num_target
    return [
        ("src_parts", (R, P, p, p, 3), "float32"),
        ("src_mask_parts", (R, P, p, p), "float32"),
        ("tgt_parts", (T, P, p, p, 3), "float32"),
        ("tgt_mask_parts", (T, P, p, p), "float32"),
    ]


def stage_spec(stage: int, num_refs: int = 4, num_target: int = 3,
               image_size: int = 256, part_size: int = 200,
               num_parts: int = 24, num_verts: int = 6890) -> Spec:
    """The shard record layout a given training stage consumes."""
    if stage <= 2:
        return textonly_spec(num_refs=num_refs, num_target=num_target,
                             part_size=part_size, num_parts=num_parts)
    return interval_spec(num_refs=num_refs, image_size=image_size,
                         part_size=part_size, num_parts=num_parts,
                         num_verts=num_verts)


def pack_dancevideo(
    data_root: str, smpl_root: str, mask_root: str, out_dir: str,
    mode: str = "train", samples_per_video: int = 4, num_refs: int = 4,
    seed: int = 0, num_verts: int = 6890, kind: str = "interval",
    num_target: int = 3,
) -> int:
    """Pre-pack training samples into shards so training reads through the
    native prefetching reader instead of per-step cv2 decodes (the
    reference's throughput bottleneck, SURVEY.md §7).  ``kind='interval'``
    packs stage-3/4 records, ``kind='textonly'`` stage-1/2 records."""
    import os

    from jafpro_tpu.data.dataset import (
        list_videos, load_interval_sample, load_textonly_sample)

    rng = np.random.RandomState(seed)
    if kind == "textonly":
        spec = textonly_spec(num_refs=num_refs, num_target=num_target)
    else:
        spec = interval_spec(num_refs=num_refs, num_verts=num_verts)
    os.makedirs(out_dir, exist_ok=True)

    def gen():
        for vid in list_videos(data_root, mode):
            for _ in range(samples_per_video):
                if kind == "textonly":
                    s = load_textonly_sample(
                        os.path.join(data_root, mode), vid, rng,
                        num_refs, num_target)
                else:
                    s = load_interval_sample(
                        os.path.join(data_root, mode),
                        os.path.join(smpl_root, mode),
                        os.path.join(mask_root, mode),
                        vid, rng, num_refs, 1)
                rec = {}
                for name, shape, dtype in spec:
                    v = s[name]
                    if v.shape != tuple(shape):  # strip/add batch dims
                        v = v.reshape(shape)
                    rec[name] = v
                yield rec

    return pack_shard(
        spec, gen(), os.path.join(out_dir, f"{mode}-{kind}-00000.shard"))
