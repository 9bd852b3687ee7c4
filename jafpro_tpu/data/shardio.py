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
import hashlib
import os
import struct
import subprocess
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

Spec = Sequence[Tuple[str, Tuple[int, ...], str]]

# Shard-file header: magic + format version + a hash of the record spec.
# Guards against silently reading shards packed under a different spec
# whose record size happens to divide the file (e.g. a pre-uint8 float32
# record is exactly 4x the uint8 one).  Headerless files (packed before
# this header existed) fall back to the size-divisibility check.
SHARD_MAGIC = b"JFS1"
SHARD_VERSION = 1
HEADER_BYTES = 24  # magic[4] + version u32 + spec_hash u64 + reserved u64


def spec_hash(spec: Spec) -> int:
    """Stable 64-bit hash of the record layout (names, shapes, dtypes)."""
    canon = ";".join(
        f"{name}:{','.join(map(str, shape))}:{np.dtype(dtype).str}"
        for name, shape, dtype in spec)
    return struct.unpack(
        "<Q", hashlib.blake2b(canon.encode(), digest_size=8).digest())[0]


def _pack_header(spec: Spec) -> bytes:
    return SHARD_MAGIC + struct.pack(
        "<IQQ", SHARD_VERSION, spec_hash(spec), 0)


def _check_header(path: str, spec: Spec, rb: int) -> int:
    """Validate ``path`` against ``spec``; returns the header size to skip
    (0 for legacy headerless files, which only get the size check)."""
    sz = os.path.getsize(path)
    with open(path, "rb") as f:
        head = f.read(HEADER_BYTES)
    if head[:4] == SHARD_MAGIC:
        version, shash, _ = struct.unpack("<IQQ", head[4:])
        if version != SHARD_VERSION:
            raise IOError(f"{path}: shard format version {version} != "
                          f"{SHARD_VERSION}; re-run `cli pack`")
        if shash != spec_hash(spec):
            raise IOError(
                f"{path}: shard spec hash {shash:#x} does not match the "
                f"requested record layout ({spec_hash(spec):#x}) — the "
                "shard was packed under a different spec (field set, "
                "shapes, or dtypes differ); re-run `cli pack`")
        payload = sz - HEADER_BYTES
        header = HEADER_BYTES
    else:
        payload = sz
        header = 0
    if payload < 0 or payload % rb:
        raise IOError(
            f"{path}: payload {payload} is not a multiple of the record "
            f"size {rb} — the shard was packed under a different spec "
            "(e.g. the pre-uint8 float32 format); re-run `cli pack`")
    return header

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
            ctypes.c_uint64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, ctypes.c_int, ctypes.c_int]
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
    """Write an iterable of sample dicts to one shard file (with the
    spec-hash header); returns the record count."""
    n = 0
    with open(path, "wb") as f:
        f.write(_pack_header(spec))
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
        headers = {p: _check_header(p, spec, self.rb) for p in paths}
        if len(set(headers.values())) > 1:
            raise IOError(
                "mixed headered/headerless shards in one reader: "
                f"{headers} — re-run `cli pack` on the legacy files")
        header = next(iter(headers.values())) if headers else 0
        lib = _lib()
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._h = lib.shardio_open(
            arr, len(paths), self.rb, header, batch, prefetch, threads,
            seed, int(shuffle), int(loop))
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
    """Record layout for stage-3/4 training samples.

    Image-like fields are stored uint8 (the decoded PNG/JPEG bytes) and
    normalized ON DEVICE (``train.common.normalize_batch``): the remote-TPU
    transport makes H2D bandwidth the per-iteration floor, and shipping
    float32 copies of uint8 sources quadruples both the wire bytes and the
    shard-file reads for zero information.  ``tgt_iuv`` is not stored at
    all — it is ``(tgt_iuv255/255 - .5)*2``, derived on device.
    ``bg_incomplete`` stays float32: it carries unclipped Gaussian noise
    (reference ``train/4:230-231``)."""
    S, p, P, R = image_size, part_size, num_parts, num_refs
    return [
        ("src_parts", (R, P, p, p, 3), "uint8"),
        ("src_mask_parts", (R, P, p, p), "uint8"),
        ("tgt_iuv255", (1, S, S, 3), "uint8"),
        ("tgt_img", (1, S, S, 3), "uint8"),
        ("src_img_first", (1, S, S, 3), "uint8"),
        ("src_imgs", (R, S, S, 3), "uint8"),
        ("bg_incomplete", (1, S, S, 3), "float32"),
        ("smpl_mask", (1, S, S, 1), "uint8"),
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

# uint8 wire encoding by field semantics (see train.common.normalize_batch
# for the device-side inverse): symmetric (-1,1) images, (0,1) masks, and
# raw 0..255 IUV codes
U8_SYMMETRIC_FIELDS = frozenset({
    "src_parts", "tgt_parts", "tgt_img", "src_img_first", "src_imgs",
    "prev_img"})
U8_UNIT_FIELDS = frozenset({
    "src_mask_parts", "tgt_mask_parts", "smpl_mask"})
U8_RAW_FIELDS = frozenset({"tgt_iuv255"})


def encode_field_u8(name: str, value: np.ndarray) -> np.ndarray:
    """Float sample field -> its uint8 wire form (exact for PNG-derived
    values: the loaders compute u/255*2-1 and u/255, both of which
    round-trip through the rounding below bit-exactly).  Out-of-range
    values (non-PNG sources) saturate instead of wrapping mod 256."""
    if name in U8_SYMMETRIC_FIELDS:
        scaled = np.rint((value + 1.0) * 0.5 * 255.0)
    elif name in U8_UNIT_FIELDS:
        scaled = np.rint(value * 255.0)
    else:
        scaled = np.rint(value)  # raw 0..255 codes
    return np.clip(scaled, 0.0, 255.0).astype(np.uint8)


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
    """Record layout for stage-1/2 (texture-only) training samples.

    uint8 wire format, normalized on device — see ``interval_spec``;
    a float32 textonly record is 107 MB/sample, this one is 27 MB."""
    p, P, R, T = part_size, num_parts, num_refs, num_target
    return [
        ("src_parts", (R, P, p, p, 3), "uint8"),
        ("src_mask_parts", (R, P, p, p), "uint8"),
        ("tgt_parts", (T, P, p, p, 3), "uint8"),
        ("tgt_mask_parts", (T, P, p, p), "uint8"),
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


def clip_spec(num_refs: int = 4, frames: int = 30, image_size: int = 256,
              part_size: int = 200, num_parts: int = 24,
              num_verts: int = 6890) -> Spec:
    """Record layout for one whole SERVING clip (the ``cli infer`` input:
    every field ``data.dataset.load_clip`` assembles, minus the gt frames).

    Packing test clips moves the serving loop's per-clip host work — PNG
    decodes, the angle-based reference selection, the parts reshape —
    to pack time: the measured round-4 breakdown attributed 0.75 s/clip
    to decode alone on a 1-core host (TUNING.md round 4; reference serial
    loop ``test/conv_pro_test.py:143-163``)."""
    S, p, P, R, T = image_size, part_size, num_parts, num_refs, frames
    return [
        ("src_parts", (R, P, p, p, 3), "uint8"),
        ("src_mask_parts", (R, P, p, p), "uint8"),
        ("bg_incomplete", (S, S, 3), "float32"),
        ("src_imgs", (R, S, S, 3), "uint8"),
        ("chosen_frames", (R,), "int32"),
        ("tgt_iuv255", (T, S, S, 3), "uint8"),
        ("smpl_mask", (T, S, S, 1), "uint8"),
        ("cams", (T, 3), "float32"),
        ("verts", (T, num_verts, 3), "float32"),
    ]


def pack_test_clips(data_root: str, smpl_root: str, mask_root: str,
                    out_dir: str, mode: str = "test",
                    num_refs: int = 4) -> int:
    """Pack every ``mode`` clip into ``<out_dir>/{mode}-clips-00000.shard``
    + ``index.json`` (vid names, chosen reference-frame names, shapes).
    Returns the clip count."""
    import json as _json

    from jafpro_tpu.data.dataset import list_videos, load_clip

    vids = list_videos(data_root, mode)
    if not vids:
        raise FileNotFoundError(f"no {mode} videos under {data_root}")
    os.makedirs(out_dir, exist_ok=True)
    index = {"mode": mode, "num_refs": num_refs, "vids": [],
             "chosen_names": []}
    spec = None

    def gen():
        nonlocal spec
        for vid in vids:
            c = load_clip(os.path.join(data_root, mode),
                          os.path.join(smpl_root, mode),
                          os.path.join(mask_root, mode),
                          vid, num_refs=num_refs)
            if spec is None:
                spec = clip_spec(
                    num_refs=num_refs, frames=c["tgt_iuv255"].shape[0],
                    image_size=c["tgt_iuv255"].shape[1],
                    part_size=c["src_parts"].shape[-2],
                    num_parts=c["src_parts"].shape[2],
                    num_verts=c["verts"].shape[1])
            rec = {}
            for name, shape, dtype in spec:
                v = np.asarray(c[name])
                if v.shape != tuple(shape):
                    v = v.reshape(shape)  # strip the loader's batch dim
                if np.dtype(dtype) != v.dtype:
                    if dtype == "uint8":
                        v = encode_field_u8(name, v)
                    else:
                        v = v.astype(dtype)
                rec[name] = v
            index["vids"].append(vid)
            index["chosen_names"].append(list(c["chosen_names"]))
            yield rec

    # spec depends on the first clip: prime the generator before writing
    it = iter(gen())
    first = next(it)

    def chained():
        yield first
        yield from it

    n = pack_shard(spec, chained(),
                   os.path.join(out_dir, f"{mode}-clips-00000.shard"))
    index["spec"] = [[name, list(shape), dtype]
                     for name, shape, dtype in spec]
    with open(os.path.join(out_dir, "index.json"), "w") as f:
        _json.dump(index, f)
    return n


class ClipPackReader:
    """Random-access reader over a packed serving-clip shard
    (``pack_test_clips`` output).  ``load(i)`` returns the same dict
    ``load_clip`` would (minus ``gt_frames``), in the uint8 wire form the
    generator normalizes on device."""

    def __init__(self, pack_dir: str):
        import json as _json

        with open(os.path.join(pack_dir, "index.json")) as f:
            self.index = _json.load(f)
        self.spec: Spec = [
            (name, tuple(shape), dtype)
            for name, shape, dtype in self.index["spec"]]
        self.vids: List[str] = self.index["vids"]
        self.num_refs: int = self.index["num_refs"]
        self.rb = record_bytes(self.spec)
        self.path = os.path.join(
            pack_dir, f"{self.index['mode']}-clips-00000.shard")
        self._header = _check_header(self.path, self.spec, self.rb)
        n = (os.path.getsize(self.path) - self._header) // self.rb
        if n != len(self.vids):
            raise IOError(
                f"{self.path}: {n} records but index lists "
                f"{len(self.vids)} vids — repack")

    def __len__(self) -> int:
        return len(self.vids)

    def load(self, i: int) -> Dict[str, np.ndarray]:
        with open(self.path, "rb") as f:
            f.seek(self._header + i * self.rb)
            buf = np.frombuffer(f.read(self.rb), np.uint8)
        rec = unpack_batch(self.spec, buf, 1)
        out = {}
        for name, shape, _ in self.spec:
            v = rec[name][0]
            # restore the loader's batch-dim layout (load_clip contract)
            if name in ("src_parts", "src_mask_parts", "bg_incomplete"):
                v = v[None]
            out[name] = v
        out["ref_mask"] = np.ones((1, self.num_refs), np.float32)
        out["vid_name"] = self.vids[i]
        out["chosen_names"] = self.index["chosen_names"][i]
        return out


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
                    if dtype == "uint8" and v.dtype != np.uint8:
                        v = encode_field_u8(name, v)
                    rec[name] = v
                yield rec

    return pack_shard(
        spec, gen(), os.path.join(out_dir, f"{mode}-{kind}-00000.shard"))
