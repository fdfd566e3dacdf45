"""Multimodal columns: images/audio as opaque binary + typed metadata.

Design for 100 TB media pipelines: payloads ride as Arrow ``binary`` columns
(zero-copy blocks), metadata extraction / feature stages are actor-pool
``map_batches`` callables with small ``batch_size`` (payloads are wide), and
the payload column is projected away as soon as features are out — the same
discipline as the ``html`` column in extraction.

What is REAL here (pure stdlib, deterministic, tested):
- container sniffing (PNG / JPEG / GIF / RIFF-WAV magic),
- header metadata parsing: PNG IHDR width/height/bit-depth, JPEG SOF0/2
  dimensions, WAV fmt-chunk sample-rate/channels/bits + duration.

What is STUBBED (no image/audio libs in this container):
- pixel/sample decode: ``decode_pixels`` raises NotImplementedError unless
  ``fake=True``, in which case a clearly-marked deterministic fake feature
  vector (seeded by content hash) stands in for a model embedding — the Ray
  plumbing (schemas, actor signature, batch sizing, output layout) is real
  and is what the tests pin.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..functions.hashing import stable_hash_bytes_u64

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
])

FEATURE_DIM = 16
_MAX_SANE_FRAMES = 10_000_000   # > 46 days at 2.5 fps — anything above is corrupt
_MAX_SANE_DIM = 65_536


def sniff_kind(payload: bytes) -> str:
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    return "unknown"


def parse_avi_header(payload: bytes) -> dict:
    """Real RIFF-AVI main-header parse: scan for the ``avih`` chunk
    (MainAVIHeader: µs/frame @0, total_frames @16, width @32, height @36)."""
    i = 12
    n = len(payload)
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        if cid == b"LIST":
            i += 12  # descend into the list (skip its 4-byte list type)
            continue
        if cid == b"avih" and i + 8 + 40 <= n:
            body = payload[i + 8 :]
            usec = struct.unpack("<I", body[0:4])[0]
            total = struct.unpack("<I", body[16:20])[0]
            w, h = struct.unpack("<II", body[32:40])
            # hostile/corrupt headers: uint32 fields can exceed any sane
            # bound (and int32 Arrow columns) — treat absurd values as an
            # unparseable header rather than crashing the batch
            if (total > _MAX_SANE_FRAMES or w > _MAX_SANE_DIM
                    or h > _MAX_SANE_DIM):
                return {}
            fps = 1e6 / usec if usec else 0.0
            return {"width": w, "height": h, "n_frames": total, "fps": fps,
                    "duration_s": total * usec / 1e6}
        i += 8 + size + (size % 2)
    return {}


def parse_png_header(payload: bytes) -> dict:
    # IHDR is always the first chunk: length(4) 'IHDR' w(4) h(4) depth(1) color(1)
    if len(payload) < 33 or payload[12:16] != b"IHDR":
        return {}
    w, h = struct.unpack(">II", payload[16:24])
    depth, color = payload[24], payload[25]
    return {"width": w, "height": h, "bit_depth": depth, "color_type": color}


def parse_jpeg_header(payload: bytes) -> dict:
    i = 2
    n = len(payload)
    while i + 9 < n:
        if payload[i] != 0xFF:
            break
        marker = payload[i + 1]
        if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0-3: baseline/progressive
            h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
            return {"width": w, "height": h, "bit_depth": payload[i + 4]}
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        i += 2 + seg_len
    return {}


def parse_wav_header(payload: bytes) -> dict:
    i = 12
    n = len(payload)
    out: dict = {}
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= n:
            channels, rate = struct.unpack("<HI", payload[i + 10 : i + 16])
            bits = struct.unpack("<H", payload[i + 22 : i + 24])[0]
            out.update({"channels": channels, "sample_rate": rate, "bit_depth": bits})
        elif cid == b"data":
            out["n_data_bytes"] = size
        i += 8 + size + (size % 2)
    if {"sample_rate", "channels", "bit_depth", "n_data_bytes"} <= out.keys():
        denom = out["sample_rate"] * out["channels"] * (out["bit_depth"] // 8)
        out["duration_s"] = out["n_data_bytes"] / denom if denom else 0.0
    return out


def decode_pixels(payload: bytes, *, fake: bool = False) -> np.ndarray:
    """STUB: real pixel decode needs an image library this container lacks.

    With ``fake=True`` returns a deterministic content-keyed pseudo-feature —
    a stand-in for a model embedding so downstream plumbing is exercisable."""
    if not fake:
        raise NotImplementedError(
            "pixel/sample decode requires an image/audio library not present "
            "in this environment; pass fake=True for the deterministic stub")
    rng = np.random.default_rng(stable_hash_bytes_u64(payload))
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def sample_pixels(payload: bytes, ys: np.ndarray, xs: np.ndarray, *,
                  fake: bool = False) -> np.ndarray:
    """STUB decode-at-coordinates: returns uint8 gray values for the given
    (y, x) pixel coordinates.

    A real decoder would decompress the image once and index it; without an
    image library the fake path derives each value deterministically from
    (content hash, y, x) — vectorized, so the RESIZE GEOMETRY downstream is
    exercised on arbitrary image sizes with O(target) not O(source) work."""
    if not fake:
        raise NotImplementedError(
            "pixel decode requires an image library not present in this "
            "environment; pass fake=True for the deterministic stub")
    from ..functions.hashing import hash_u64_array

    base = np.uint64(stable_hash_bytes_u64(payload))
    mixed = hash_u64_array(
        base + ys.astype(np.uint64) * np.uint64(1_000_003)
        + xs.astype(np.uint64), seed=7)
    return (mixed & np.uint64(0xFF)).astype(np.uint8)


def phash_batch(batch: pa.Table, *, payload_col: str = "payload",
                id_col: str = "media_id", fake: bool = True) -> pa.Table:
    """64-bit perceptual difference hash (dHash) per IMAGE row: an 8×9
    grayscale grid via the real resize geometry (``resize_plan``) over the
    pixel source (stubbed; see ``sample_pixels``), adjacent-column
    comparisons → 64 bits.  Identical payloads hash identically regardless
    of media_id, so exact/near image duplicates collide.  Non-image rows
    emit nothing (audio/video have no dHash).  Output column is named
    ``simhash`` so the banded 64-bit candidate machinery
    (stages/dedup.py::hash64_candidates) applies unchanged."""
    ids: list[int] = []
    vals: list[int] = []
    for mid, payload in zip(batch.column(id_col).to_pylist(),
                            batch.column(payload_col).to_pylist()):
        payload = payload or b""
        kind = sniff_kind(payload)
        meta = (parse_png_header(payload) if kind == "png"
                else parse_jpeg_header(payload) if kind == "jpeg" else {})
        if not meta.get("width") or not meta.get("height"):
            continue
        ys, xs = resize_plan(meta["height"], meta["width"], 8, 9)
        yy, xx = np.meshgrid(ys, xs, indexing="ij")
        g = sample_pixels(payload, yy.ravel().astype(np.uint64),
                          xx.ravel().astype(np.uint64),
                          fake=fake).reshape(8, 9).astype(np.int16)
        bits = (g[:, 1:] > g[:, :-1]).ravel()
        h = int.from_bytes(np.packbits(bits).tobytes(), "big")
        ids.append(int(mid))
        vals.append(h - (1 << 64) if h >= (1 << 63) else h)  # int64 storage
    return pa.table({id_col: pa.array(ids, pa.int64()),
                     "simhash": pa.array(vals, pa.int64())})


def resize_plan(src_h: int, src_w: int, dst_h: int, dst_w: int
                ) -> tuple[np.ndarray, np.ndarray]:
    """REAL nearest-neighbor resize geometry (pixel-center sampling, the
    OpenCV/PIL NEAREST convention): source index = floor((i + 0.5) · s/d)."""
    ys = np.minimum((np.arange(dst_h) + 0.5) * (src_h / dst_h), src_h - 1) \
        .astype(np.int64)
    xs = np.minimum((np.arange(dst_w) + 0.5) * (src_w / dst_w), src_w - 1) \
        .astype(np.int64)
    return ys, xs


class MediaResizeStage:
    """Actor-pool stage: image payload → resized grayscale thumbnail bytes.

    Real parts: header-dims parse, resize geometry (``resize_plan``), output
    layout (fixed-size binary thumbnail + dims).  Stubbed part: the pixel
    source (``sample_pixels`` fake).  Non-image rows emit NULL thumbnail."""

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id",
                 out_h: int = 16, out_w: int = 16, fake: bool = True):
        self.payload_col, self.id_col = payload_col, id_col
        self.out_h, self.out_w, self.fake = out_h, out_w, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        thumbs: list[bytes | None] = []
        for payload in batch.column(self.payload_col).to_pylist():
            payload = payload or b""
            kind = sniff_kind(payload)
            meta = (parse_png_header(payload) if kind == "png"
                    else parse_jpeg_header(payload) if kind == "jpeg" else {})
            if not meta.get("width") or not meta.get("height"):
                thumbs.append(None)
                continue
            ys, xs = resize_plan(meta["height"], meta["width"],
                                 self.out_h, self.out_w)
            yy, xx = np.meshgrid(ys, xs, indexing="ij")
            thumbs.append(sample_pixels(payload, yy.ravel(), xx.ravel(),
                                        fake=self.fake).tobytes())
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "thumb": pa.array(thumbs, pa.binary()),
            "thumb_h": pa.array([self.out_h] * batch.num_rows, pa.int32()),
            "thumb_w": pa.array([self.out_w] * batch.num_rows, pa.int32()),
        })


def frame_sample_batch(batch: pa.Table, *, every_n: int = 10,
                       max_frames_per_video: int = 100_000,
                       payload_col: str = "payload",
                       id_col: str = "media_id") -> pa.Table:
    """Video frame sampling: explode each video row into every-Nth-frame rows
    (frame index + timestamp from the REAL avih header; per-frame feature is
    the content+frame-keyed stub).  Non-video rows produce no output rows —
    the flat-map shape of a real frame extractor.

    ``max_frames_per_video`` bounds the per-row explosion (a corrupt header
    cannot OOM a task); the cap is NOT silent — every output row carries
    ``n_frames_total``, so a consumer sees ``max(frame_idx) < n_frames_total``
    whenever truncation happened."""
    ids_out, fidx_out, ts_out, total_out, feat_out = [], [], [], [], []
    for mid, payload in zip(batch.column(id_col).to_pylist(),
                            batch.column(payload_col).to_pylist()):
        payload = payload or b""
        if sniff_kind(payload) != "avi":
            continue
        meta = parse_avi_header(payload)
        n, fps = int(meta.get("n_frames", 0)), meta.get("fps", 0.0)
        for f in range(0, min(n, max_frames_per_video * every_n), every_n):
            ids_out.append(mid)
            fidx_out.append(f)
            ts_out.append(f / fps if fps else 0.0)
            total_out.append(n)
            feat_out.append(sample_pixels(
                payload, np.full(FEATURE_DIM, f, dtype=np.uint64),
                np.arange(FEATURE_DIM, dtype=np.uint64), fake=True)
                .astype("<f4").tobytes())
    return pa.table({
        id_col: pa.array(ids_out, pa.int64()),
        "frame_idx": pa.array(fidx_out, pa.int32()),
        "t_s": pa.array(ts_out, pa.float64()),
        "n_frames_total": pa.array(total_out, pa.int32()),
        # float32-LE bytes (not list<float>): hashable/sortable for the
        # driver's canonical row compare; np.frombuffer to consume
        "frame_feature": pa.array(feat_out, pa.binary()),
    })


class MediaMetadataStage:
    """Actor-pool stage: binary payload → (kind, metadata columns).

    Real header parsing; use small ``batch_size`` — payload blocks are wide.
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id"):
        self.payload_col, self.id_col = payload_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds, widths, heights, rates, durs, frames, fpss = [], [], [], [], [], [], []
        for payload in batch.column(self.payload_col).to_pylist():
            payload = payload or b""
            kind = sniff_kind(payload)
            kinds.append(kind)
            meta: dict = {}
            if kind == "png":
                meta = parse_png_header(payload)
            elif kind == "jpeg":
                meta = parse_jpeg_header(payload)
            elif kind == "wav":
                meta = parse_wav_header(payload)
            elif kind == "avi":
                meta = parse_avi_header(payload)
            widths.append(meta.get("width"))
            heights.append(meta.get("height"))
            rates.append(meta.get("sample_rate"))
            durs.append(meta.get("duration_s"))
            frames.append(meta.get("n_frames"))
            fpss.append(meta.get("fps"))
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "kind": pa.array(kinds, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "sample_rate": pa.array(rates, pa.int32()),
            "duration_s": pa.array(durs, pa.float64()),
            "n_frames": pa.array(frames, pa.int32()),
            "fps": pa.array(fpss, pa.float64()),
            "n_bytes": pa.array([len(p or b"") for p in
                                 batch.column(self.payload_col).to_pylist()], pa.int64()),
        })


class MediaFeatureStage:
    """Actor-pool stage: payload → FEATURE_DIM feature vector (stubbed decode).

    The output layout (fixed-size list column) and per-actor init are the real
    contract; the feature values are the deterministic fake until a decoder
    library exists.
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id",
                 fake: bool = True):
        self.payload_col, self.id_col, self.fake = payload_col, id_col, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [decode_pixels(p or b"", fake=self.fake).tolist()
                 for p in batch.column(self.payload_col).to_pylist()]
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "feature": pa.array(feats, pa.list_(pa.float32(), FEATURE_DIM)),
        })


# --- synthetic media payloads (valid headers, deterministic) ------------------


def synth_png(media_id: int, seed: int = 42) -> bytes:
    rng = np.random.default_rng(stable_hash_bytes_u64(f"png:{seed}:{media_id}".encode()))
    w, h = int(rng.integers(16, 2048)), int(rng.integers(16, 2048))
    ihdr_data = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    import zlib as _z

    ihdr = struct.pack(">I", 13) + b"IHDR" + ihdr_data + \
        struct.pack(">I", _z.crc32(b"IHDR" + ihdr_data) & 0xFFFFFFFF)
    body = rng.integers(0, 255, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
    idat = struct.pack(">I", len(body)) + b"IDAT" + body + \
        struct.pack(">I", _z.crc32(b"IDAT" + body) & 0xFFFFFFFF)
    iend = struct.pack(">I", 0) + b"IEND" + struct.pack(">I", _z.crc32(b"IEND") & 0xFFFFFFFF)
    return b"\x89PNG\r\n\x1a\n" + ihdr + idat + iend


def synth_wav(media_id: int, seed: int = 42) -> bytes:
    rng = np.random.default_rng(stable_hash_bytes_u64(f"wav:{seed}:{media_id}".encode()))
    rate = int(rng.choice([8000, 16000, 44100]))
    channels = int(rng.choice([1, 2]))
    n_samples = int(rng.integers(100, 5000))
    data = rng.integers(-32768, 32767, size=n_samples * channels,
                        dtype=np.int16).tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt + \
        b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def synth_avi(media_id: int, seed: int = 42) -> bytes:
    """Minimal valid RIFF-AVI: hdrl LIST with a real MainAVIHeader chunk."""
    rng = np.random.default_rng(stable_hash_bytes_u64(f"avi:{seed}:{media_id}".encode()))
    fps = int(rng.choice([24, 25, 30]))
    usec = 1_000_000 // fps
    total = int(rng.integers(30, 600))
    w, h = int(rng.integers(160, 1920)), int(rng.integers(120, 1080))
    avih_body = struct.pack("<IIIIIIII", usec, 0, 0, 0, total, 0, 1, 0) \
        + struct.pack("<II", w, h) + b"\x00" * 16
    avih = b"avih" + struct.pack("<I", len(avih_body)) + avih_body
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih)) + b"hdrl" + avih
    movi = b"LIST" + struct.pack("<I", 4) + b"movi"
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def media_batch(indices: np.ndarray, seed: int = 42) -> pa.Table:
    ids, payloads = [], []
    for i in indices:
        i = int(i)
        ids.append(i)
        if i % 4 == 0:
            payloads.append(synth_png(i, seed))
        elif i % 4 == 1:
            payloads.append(synth_wav(i, seed))
        elif i % 4 == 2:
            payloads.append(synth_avi(i, seed))
        else:
            payloads.append(b"\x00garbage-payload" + bytes([i % 256]))
    return pa.table({"media_id": pa.array(ids, pa.int64()),
                     "payload": pa.array(payloads, pa.binary())})
