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


def sniff_kind(payload: bytes) -> str:
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return "unknown"


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


class MediaMetadataStage:
    """Actor-pool stage: binary payload → (kind, metadata columns).

    Real header parsing; use small ``batch_size`` — payload blocks are wide.
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id"):
        self.payload_col, self.id_col = payload_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds, widths, heights, rates, durs = [], [], [], [], []
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
            widths.append(meta.get("width"))
            heights.append(meta.get("height"))
            rates.append(meta.get("sample_rate"))
            durs.append(meta.get("duration_s"))
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "kind": pa.array(kinds, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "sample_rate": pa.array(rates, pa.int32()),
            "duration_s": pa.array(durs, pa.float64()),
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


def media_batch(indices: np.ndarray, seed: int = 42) -> pa.Table:
    ids, payloads = [], []
    for i in indices:
        i = int(i)
        ids.append(i)
        if i % 3 == 0:
            payloads.append(synth_png(i, seed))
        elif i % 3 == 1:
            payloads.append(synth_wav(i, seed))
        else:
            payloads.append(b"\x00garbage-payload" + bytes([i % 256]))
    return pa.table({"media_id": pa.array(ids, pa.int64()),
                     "payload": pa.array(payloads, pa.binary())})
