"""Real container codecs (PNG, RIFF/WAVE): byte-exact round-trips,
adversarial decode (all five PNG filters, CRC/truncation/unknown
chunks), and end-to-end transit through the Arrow UDF lanes."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from jepl_spark.sources import audio
from jepl_spark.sources import containers as C


def _rng(seed):
    return np.random.default_rng(seed)


# -- PNG ----------------------------------------------------------------------


class TestPng:
    @pytest.mark.parametrize("c", [1, 2, 3, 4])
    def test_roundtrip_exact(self, c):
        px = _rng(c).integers(0, 256, size=(13, 17, c), dtype=np.uint8)
        out = C.png_decode(C.png_encode(px))
        assert out.shape == (13, 17, c)
        assert np.array_equal(out, px)

    def test_grayscale_2d_input(self):
        px = _rng(7).integers(0, 256, size=(5, 9), dtype=np.uint8)
        out = C.png_decode(C.png_encode(px))
        assert out.shape == (5, 9, 1)
        assert np.array_equal(out[:, :, 0], px)

    def test_signature_and_chunk_layout(self):
        """The emitted bytes are a standards-shaped PNG: signature,
        IHDR first, IEND last, CRCs valid (decode verifies them)."""
        buf = C.png_encode(np.zeros((2, 2, 3), dtype=np.uint8))
        assert buf[:8] == b"\x89PNG\r\n\x1a\n"
        assert buf[12:16] == b"IHDR"
        assert buf[-8:-4] == b"IEND"
        w, h = struct.unpack(">II", buf[16:24])
        assert (w, h) == (2, 2)

    def test_all_five_filters_decode(self):
        """Hand-build a PNG whose scanlines use filters 0..4 (applying
        each filter forward with independent reference code) and check
        the decoder reconstructs the original pixels — wild encoders
        emit Sub/Up/Average/Paeth, not just None."""
        h, w, c = 5, 7, 3
        px = _rng(42).integers(0, 256, size=(h, w, c), dtype=np.uint8)
        flat = px.reshape(h, w * c).astype(int)
        stream = bytearray()
        for r in range(h):
            f = r % 5
            line = flat[r]
            prior = flat[r - 1] if r else np.zeros(w * c, dtype=int)
            enc = np.empty(w * c, dtype=int)
            for i in range(w * c):
                left = line[i - c] if i >= c else 0
                up = prior[i]
                ul = prior[i - c] if i >= c else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = left
                elif f == 2:
                    pred = up
                elif f == 3:
                    pred = (left + up) // 2
                else:
                    pred = C._paeth(int(left), int(up), int(ul))
                enc[i] = (line[i] - pred) % 256
            stream.append(f)
            stream.extend(int(v) for v in enc)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        buf = (
            b"\x89PNG\r\n\x1a\n"
            + C._chunk(b"IHDR", ihdr)
            + C._chunk(b"IDAT", zlib.compress(bytes(stream)))
            + C._chunk(b"IEND", b"")
        )
        assert np.array_equal(C.png_decode(buf), px)

    def test_crc_corruption_rejected(self):
        buf = bytearray(C.png_encode(np.zeros((4, 4, 3), dtype=np.uint8)))
        buf[40] ^= 0xFF  # flip a byte inside IDAT
        with pytest.raises(ValueError, match="CRC"):
            C.png_decode(bytes(buf))

    def test_not_a_png_rejected(self):
        with pytest.raises(ValueError, match="signature"):
            C.png_decode(b"GIF89a....")

    def test_palette_rejected(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)  # color type 3
        buf = (
            b"\x89PNG\r\n\x1a\n"
            + C._chunk(b"IHDR", ihdr)
            + C._chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
            + C._chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="color type"):
            C.png_decode(buf)


# -- WAV ----------------------------------------------------------------------


class TestWav:
    @pytest.mark.parametrize("codec,min_snr", [
        ("pcm16", 60.0), ("ulaw", 30.0), ("alaw", 30.0),
    ])
    def test_roundtrip_snr_and_metadata(self, codec, min_snr):
        wave = audio.synth_wave(3, 16000, 400)
        buf = C.wav_encode(wave, 16000, codec)
        out, sr, inner = C.wav_decode(buf)
        assert (sr, inner) == (16000, codec)
        assert out.size == wave.size
        assert audio.snr_db(wave, out) >= min_snr
        # container framing: RIFF size field covers the whole file
        assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"
        (riff_len,) = struct.unpack_from("<I", buf, 4)
        assert riff_len + 8 == len(buf)

    def test_unknown_chunks_skipped(self):
        """Real files carry LIST/INFO etc. between fmt and data."""
        wave = audio.synth_wave(5, 8000, 250)
        buf = C.wav_encode(wave, 8000, "pcm16")
        # splice an unknown chunk right after the fmt chunk (ends at
        # 12 + 8 + 16 = 36)
        junk = b"LIST" + struct.pack("<I", 6) + b"INFOxy"
        spliced = buf[:36] + junk + buf[36:]
        out, sr, inner = C.wav_decode(spliced)
        assert (sr, inner) == (8000, "pcm16")
        assert audio.snr_db(wave, out) >= 60.0

    def test_odd_payload_padded_word_aligned(self):
        # odd sample count in an 8-bit codec → odd data payload →
        # pad byte, but the data length field stays exact
        wave = audio.synth_wave(1, 8000, 375)  # 3000 samples
        buf = C.wav_encode(wave[:2999], 8000, "ulaw")
        out, _, _ = C.wav_decode(buf)
        assert out.size == 2999

    def test_non_pcm_has_fact_chunk_and_extended_fmt(self):
        buf = C.wav_encode(audio.synth_wave(2, 8000, 200), 8000, "alaw")
        assert b"fact" in buf
        # spec: non-PCM formats carry the EXTENDED fmt chunk (size 18,
        # cbSize=0); PCM keeps the bare 16-byte form
        (fmt_len,) = struct.unpack_from("<I", buf, 16)
        assert fmt_len == 18 and buf[36:38] == b"\x00\x00"  # cbSize=0
        pcm = C.wav_encode(audio.synth_wave(2, 8000, 200), 8000, "pcm16")
        assert b"fact" not in pcm
        (fmt_len_pcm,) = struct.unpack_from("<I", pcm, 16)
        assert fmt_len_pcm == 16

    def test_garbage_rejected(self):
        with pytest.raises(ValueError):
            C.wav_decode(b"RIFFxxxxAVI ")
        with pytest.raises(ValueError):
            C.wav_decode(b"nope")


# -- Arrow-lane transit -------------------------------------------------------


def test_wav_transits_audio_udf_lane(spark):
    """Genuine .wav file bytes flow through the existing pandas-UDF
    decode path (codec column = 'wav'): same features as the raw
    payload encoding of the same wave."""
    from jepl_spark.functions.audio_udfs import with_pcm_stats

    rows = []
    for i in range(12):
        sr = 8000 if i % 2 else 16000
        wave = audio.synth_wave(i, sr, 300)
        rows.append((f"c{i:04d}", C.wav_encode(wave, sr, "pcm16"), sr, 300,
                     "wav"))
        rows.append((f"r{i:04d}", audio.pcm16_encode(wave), sr, 300,
                     "pcm16"))
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string"
    )
    got = {
        r["clip_id"]: (r["stats"]["rms"], r["stats"]["n_samples"])
        for r in with_pcm_stats(df).select("clip_id", "stats").collect()
    }
    for i in range(12):
        w, r = got[f"c{i:04d}"], got[f"r{i:04d}"]
        assert w == pytest.approx(r, rel=1e-12)


def test_wav_chunking_matches_raw(spark):
    from jepl_spark.functions.audio_udfs import chunk_clips

    rows = []
    for i in range(6):
        wave = audio.synth_wave(i, 8000, 700)
        rows.append((f"c{i:04d}", C.wav_encode(wave, 8000, "ulaw"), 8000,
                     700, "wav"))
        rows.append((f"r{i:04d}", audio.ulaw_encode(wave), 8000, 700,
                     "ulaw"))
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string"
    )
    out = chunk_clips(df, chunk_ms=250, hop_ms=200, min_tail_ms=100)
    by_id = {}
    for r in out.collect():
        by_id.setdefault(r["clip_id"][0] + r["clip_id"][1:], r)
    chunks = out.groupBy("clip_id").count().collect()
    cnt = {r["clip_id"]: r["count"] for r in chunks}
    for i in range(6):
        assert cnt[f"c{i:04d}"] == cnt[f"r{i:04d}"] > 0
    # chunk PCM identical between container and raw transit
    pcm = {
        (r["clip_id"], r["chunk_idx"]): bytes(r["bytes"])
        for r in out.collect()
    }
    for (cid, idx), b in pcm.items():
        if cid.startswith("c"):
            assert b == pcm[("r" + cid[1:], idx)]


def test_png_transits_image_lane_and_matches_rawv1(spark):
    """decode_image_stats and image_dhash are bit-identical whether an
    image ships as the RAWv1 fixture or a real PNG container."""
    from jepl_spark.functions import multimodal as M

    raw = M.images_df(spark, 30, partitions=2)
    png = M.images_df(spark, 30, partitions=2, fmt_cycle=("png",))
    assert set(r["fmt"] for r in png.select("fmt").distinct().collect()) == {"png"}
    s_raw = {r["img_id"]: tuple(r)[1:]
             for r in M.decode_image_stats(raw).collect()}
    s_png = {r["img_id"]: tuple(r)[1:]
             for r in M.decode_image_stats(png).collect()}
    assert s_raw == s_png
    h_raw = {r["img_id"]: r["dhash"] for r in M.image_dhash(raw).collect()}
    h_png = {r["img_id"]: r["dhash"] for r in M.image_dhash(png).collect()}
    assert h_raw == h_png


def test_png_dhash_resize_robustness(spark):
    """dHash stability under nearest-neighbor downscale holds when the
    originals transit as real PNG files (the round-3 rawv1 property,
    re-verified on the real container)."""
    from pyspark.sql.functions import bit_count
    from jepl_spark.functions import multimodal as M

    imgs = M.images_df(spark, 30, partitions=2, fmt_cycle=("png",))
    orig = M.image_dhash(imgs).select("img_id", F.col("dhash").alias("h0"))
    small = M.image_dhash(M.resize_images(imgs, 48, 40)).select(
        "img_id", F.col("dhash").alias("h1")
    )
    joined = orig.join(small, "img_id")
    dist = joined.select(
        bit_count(F.col("h0").bitwiseXOR(F.col("h1"))).alias("d")
    ).agg(F.max("d").alias("mx")).collect()[0]["mx"]
    assert dist <= 10
