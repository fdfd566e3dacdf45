"""Multimodal binary-column stages: real header parsing, stubbed decode."""

import numpy as np
import pytest

from post_ocr_corrector_ray.stages import multimodal as mm


class TestHeaderParsing:
    def test_png_round_trip(self):
        payload = mm.synth_png(7)
        assert mm.sniff_kind(payload) == "png"
        meta = mm.parse_png_header(payload)
        assert 16 <= meta["width"] <= 2048 and 16 <= meta["height"] <= 2048
        assert meta["bit_depth"] == 8

    def test_wav_round_trip(self):
        payload = mm.synth_wav(4)
        assert mm.sniff_kind(payload) == "wav"
        meta = mm.parse_wav_header(payload)
        assert meta["sample_rate"] in (8000, 16000, 44100)
        assert meta["channels"] in (1, 2)
        assert meta["duration_s"] > 0

    def test_jpeg_sof(self):
        # minimal JPEG: SOI + SOF0 with 100x50
        import struct

        sof = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 50, 100, 3)
        payload = b"\xff\xd8\xff\xe0" + struct.pack(">H", 4) + b"JF" + sof
        assert mm.sniff_kind(payload) == "jpeg"
        meta = mm.parse_jpeg_header(payload)
        assert (meta["width"], meta["height"]) == (100, 50)

    def test_unknown_kind(self):
        assert mm.sniff_kind(b"\x00garbage") == "unknown"
        assert mm.sniff_kind(b"") == "unknown"


class TestDecodeStub:
    def test_raises_without_fake(self):
        with pytest.raises(NotImplementedError):
            mm.decode_pixels(b"anything")

    def test_fake_deterministic_content_keyed(self):
        a = mm.decode_pixels(b"payload-1", fake=True)
        b = mm.decode_pixels(b"payload-1", fake=True)
        c = mm.decode_pixels(b"payload-2", fake=True)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)
        assert a.shape == (mm.FEATURE_DIM,) and a.dtype == np.float32


@pytest.mark.usefixtures("ray_session")
class TestStagesOnRay:
    def test_metadata_pipeline(self):
        import ray.data

        tbl = mm.media_batch(np.arange(30))
        out = ray.data.from_arrow(tbl).map_batches(
            mm.MediaMetadataStage, batch_format="pyarrow", batch_size=8,
            concurrency=2, num_cpus=1).to_pandas()
        assert len(out) == 30
        kinds = out.set_index("media_id")["kind"]
        assert kinds[0] == "png" and kinds[1] == "wav" and kinds[2] == "avi"
        assert kinds[3] == "unknown"
        assert out.loc[out["kind"] == "png", "width"].notna().all()
        assert (out.loc[out["kind"] == "wav", "duration_s"] > 0).all()
        assert "payload" not in out.columns  # wide column projected away

    def test_feature_pipeline_schema(self):
        import ray.data

        tbl = mm.media_batch(np.arange(12))
        ds = ray.data.from_arrow(tbl).map_batches(
            mm.MediaFeatureStage, batch_format="pyarrow", batch_size=4,
            concurrency=2, num_cpus=1)
        out = ds.to_pandas()
        assert len(out) == 12
        assert all(len(f) == mm.FEATURE_DIM for f in out["feature"])
        # determinism across a rerun
        out2 = ray.data.from_arrow(tbl).map_batches(
            mm.MediaFeatureStage, batch_format="pyarrow", batch_size=7,
            concurrency=2, num_cpus=1).to_pandas()
        m1 = {i: list(f) for i, f in zip(out["media_id"], out["feature"])}
        m2 = {i: list(f) for i, f in zip(out2["media_id"], out2["feature"])}
        assert m1 == m2


class TestAviAndResize:
    def test_avi_header_roundtrip(self):
        from post_ocr_corrector_ray.stages import multimodal as mm

        p = mm.synth_avi(7)
        assert mm.sniff_kind(p) == "avi"
        meta = mm.parse_avi_header(p)
        assert meta["n_frames"] >= 30 and meta["fps"] > 0
        assert meta["duration_s"] == meta["n_frames"] * (1e6 // meta["fps"]) / 1e6 \
            or meta["duration_s"] > 0
        assert meta["width"] >= 160 and meta["height"] >= 120

    def test_resize_plan_geometry(self):
        import numpy as np

        from post_ocr_corrector_ray.stages.multimodal import resize_plan

        ys, xs = resize_plan(100, 200, 10, 10)
        # pixel-center nearest: index i maps to floor((i+0.5)*scale)
        assert ys.tolist() == [int((i + 0.5) * 10) for i in range(10)]
        assert xs.tolist() == [int((i + 0.5) * 20) for i in range(10)]
        # identity resize maps each pixel to itself
        ys2, xs2 = resize_plan(8, 8, 8, 8)
        assert ys2.tolist() == list(range(8)) and xs2.tolist() == list(range(8))

    def test_resize_stage_and_frame_sample(self):
        import numpy as np
        import pyarrow as pa

        from post_ocr_corrector_ray.stages import multimodal as mm

        batch = mm.media_batch(np.arange(12))
        thumbs = mm.MediaResizeStage(out_h=8, out_w=8)(batch)
        kinds = [mm.sniff_kind(p) for p in batch.column("payload").to_pylist()]
        for k, t in zip(kinds, thumbs.column("thumb").to_pylist()):
            if k == "png":
                assert t is not None and len(t) == 64
            else:
                assert t is None           # non-image rows: NULL thumbnail
        # deterministic
        assert thumbs.equals(mm.MediaResizeStage(out_h=8, out_w=8)(batch))

        frames = mm.frame_sample_batch(batch, every_n=10)
        metas = {i: mm.parse_avi_header(p)
                 for i, p, k in zip(batch.column("media_id").to_pylist(),
                                    batch.column("payload").to_pylist(), kinds)
                 if k == "avi"}
        assert set(frames.column("media_id").to_pylist()) == set(metas)
        for mid, meta in metas.items():
            rows = [r for r in frames.to_pylist() if r["media_id"] == mid]
            assert len(rows) == -(-meta["n_frames"] // 10)  # ceil
            assert rows[1]["t_s"] == 10 / meta["fps"]


class TestGarbageRobustness:
    def test_truncated_and_garbage_payloads_never_raise(self):
        import numpy as np
        import pyarrow as pa

        from post_ocr_corrector_ray.stages import multimodal as mm

        full = [mm.synth_png(1), mm.synth_wav(2), mm.synth_avi(3)]
        payloads = [b"", b"\x00", b"RIFF", b"RIFF\x00\x00\x00\x00WAVE",
                    b"RIFF\x00\x00\x00\x00AVI ", b"\x89PNG\r\n\x1a\n",
                    b"\xff\xd8\xff\xe0"]
        payloads += [p[:k] for p in full for k in (4, 9, 13, 21, len(p) - 3)]
        batch = pa.table({"media_id": pa.array(range(len(payloads)), pa.int64()),
                          "payload": pa.array(payloads, pa.binary())})
        meta = mm.MediaMetadataStage()(batch)
        assert meta.num_rows == len(payloads)
        thumbs = mm.MediaResizeStage(out_h=4, out_w=4)(batch)
        assert thumbs.num_rows == len(payloads)
        frames = mm.frame_sample_batch(batch)
        assert frames.num_rows >= 0  # no crash; truncated avih yields no rows


class TestHostileHeaders:
    def _avi_with(self, total_frames, w=320, h=240, usec=40000):
        import struct

        avih_body = struct.pack("<IIIIIIII", usec, 0, 0, 0, total_frames,
                                0, 1, 0) + struct.pack("<II", w, h) + b"\x00" * 16
        avih = b"avih" + struct.pack("<I", len(avih_body)) + avih_body
        hdrl = b"LIST" + struct.pack("<I", 4 + len(avih)) + b"hdrl" + avih
        body = b"AVI " + hdrl
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def test_uint32_overflow_frames_treated_as_corrupt(self):
        import pyarrow as pa

        from post_ocr_corrector_ray.stages import multimodal as mm

        hostile = self._avi_with(0xFFFFFFFF)
        assert mm.parse_avi_header(hostile) == {}
        batch = pa.table({"media_id": pa.array([1], pa.int64()),
                          "payload": pa.array([hostile], pa.binary())})
        meta = mm.MediaMetadataStage()(batch)      # must not raise ArrowInvalid
        assert meta.column("n_frames")[0].as_py() is None
        assert mm.frame_sample_batch(batch).num_rows == 0

    def test_frame_cap_is_observable(self):
        import pyarrow as pa

        from post_ocr_corrector_ray.stages import multimodal as mm

        big = self._avi_with(1_000)
        batch = pa.table({"media_id": pa.array([1], pa.int64()),
                          "payload": pa.array([big], pa.binary())})
        out = mm.frame_sample_batch(batch, every_n=10, max_frames_per_video=20)
        assert out.num_rows == 20                     # capped
        assert out.column("n_frames_total")[0].as_py() == 1_000
        # truncation visible: last sampled idx << total
        assert max(out.column("frame_idx").to_pylist()) < 1_000 - 10


@pytest.mark.usefixtures("ray_session")
class TestPhashDedup:
    def test_duplicate_payloads_found_exactly(self):
        """ids >= 150 reuse content index id-150, so every PNG content value
        c in {0,4,...,48} yields exactly the pair (c, c+150); random dHashes
        sharing a 16-bit band AND hamming <= 3 are ~impossible, so the result
        is pinned exactly."""
        import __ray_entry__ as entry

        got = entry.queries()["media_phash_dups"]("unused").to_pandas()
        want = {(c, c + 150) for c in range(0, 50, 4)}
        assert set(zip(got.id_a, got.id_b)) == want
        assert (got.hamming == 0).all()

    def test_phash_batch_images_only_and_deterministic(self):
        import pyarrow as pa

        from post_ocr_corrector_ray.stages import multimodal as mm

        t = mm.media_batch(np.arange(16), seed=42)
        h1 = mm.phash_batch(t)
        h2 = mm.phash_batch(t)
        assert h1.equals(h2)
        # only PNG rows (id % 4 == 0) are imaged in the synthetic corpus
        assert h1.column("media_id").to_pylist() == list(range(0, 16, 4))
