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


# -- baseline JPEG (sources/jpeg: pure-numpy SOF0 codec) ----------------------


class TestJpeg:
    def test_flat_blocks_exact(self):
        from jepl_spark.sources import jpeg as J

        for v in (0, 128, 200, 255):
            px = np.full((16, 24, 3), v, np.uint8)
            out = J.jpeg_decode(J.jpeg_encode(px, 90))
            assert out.shape == (16, 24, 3)
            # flat blocks carry only a DC coefficient, which survives
            # quantization round-trip exactly at these values
            assert np.abs(out.astype(int) - v).max() <= 1

    def test_smooth_gradient_tight(self):
        from jepl_spark.sources import jpeg as J

        yy, xx = np.mgrid[0:40, 0:56]
        px = np.stack(
            [(xx * 3) % 256, (yy * 2) % 256, (xx + yy) % 256], -1
        ).astype(np.uint8)
        out = J.jpeg_decode(J.jpeg_encode(px, 90))
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 4

    def test_synth_field_bound_and_quality_monotone(self):
        from jepl_spark.functions.multimodal import _synth_pixels
        from jepl_spark.sources import jpeg as J

        worst95 = worst50 = 0.0
        for i in (0, 3, 7, 11, 14):
            w, h = 32 + i % 5 * 16, 24 + i % 3 * 24
            px = _synth_pixels(i, w, h, 3)
            for q, acc in ((95, "a"), (50, "b")):
                out = J.jpeg_decode(J.jpeg_encode(px, q))
                err = np.abs(out.astype(int) - px.astype(int)).mean()
                if q == 95:
                    worst95 = max(worst95, err)
                else:
                    worst50 = max(worst50, err)
        # the gate bound, and coarser quantization must hurt more
        assert worst95 <= 4.0
        assert worst50 > worst95

    def test_grayscale_and_odd_dims(self):
        from jepl_spark.functions.multimodal import _synth_pixels
        from jepl_spark.sources import jpeg as J

        g = (np.mgrid[0:21, 0:33][1] % 251).astype(np.uint8)
        out = J.jpeg_decode(J.jpeg_encode(g, 95))
        assert out.shape == (21, 33, 1)
        px = _synth_pixels(5, 33, 21, 3)  # non-multiple-of-8 dims
        out = J.jpeg_decode(J.jpeg_encode(px, 95))
        assert out.shape == (21, 33, 3)
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 40

    def test_marker_structure(self):
        from jepl_spark.sources import jpeg as J

        buf = J.jpeg_encode(np.full((8, 8, 3), 90, np.uint8), 90)
        assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
        # marker inventory in order: APP0, DQT, SOF0, DHT, SOS
        order = []
        pos = 2
        while pos < len(buf) - 2:
            assert buf[pos] == 0xFF
            m = buf[pos + 1]
            order.append(m)
            if m == 0xDA:
                break
            (ln,) = struct.unpack_from(">H", buf, pos + 2)
            pos += 2 + ln
        assert order[0] == 0xE0
        assert order.count(0xDB) == 2 and order.count(0xC4) == 2
        assert 0xC0 in order and order[-1] == 0xDA

    def test_decoder_raises_on_unsupported_shapes(self):
        from jepl_spark.sources import jpeg as J

        good = bytearray(J.jpeg_encode(np.full((8, 8, 3), 77, np.uint8), 90))

        def find_marker(b, m):
            pos = 2
            while pos < len(b):
                if b[pos] == 0xFF and b[pos + 1] == m:
                    return pos
                (ln,) = struct.unpack_from(">H", b, pos + 2)
                pos += 2 + ln
            raise AssertionError(f"marker {m:#x} not found")

        # progressive: flip SOF0 -> SOF2
        prog = bytearray(good)
        prog[find_marker(prog, 0xC0) + 1] = 0xC2
        with pytest.raises(ValueError, match="SOF2"):
            J.jpeg_decode(bytes(prog))

        # chroma subsampling: first component sampling 0x11 -> 0x22
        sub = bytearray(good)
        sof = find_marker(sub, 0xC0)
        sub[sof + 2 + 2 + 6 + 1] = 0x22
        with pytest.raises(ValueError, match="subsampling"):
            J.jpeg_decode(bytes(sub))

        # 16-bit quant table: set Pq high nibble
        dqt = bytearray(good)
        dqt[find_marker(dqt, 0xDB) + 4] |= 0x10
        with pytest.raises(ValueError, match="16-bit"):
            J.jpeg_decode(bytes(dqt))

        # DRI inserted before SOS
        sos = find_marker(good, 0xDA)
        dri = bytes(good[:sos]) + b"\xff\xdd\x00\x04\x00\x08" + bytes(good[sos:])
        with pytest.raises(ValueError, match="restart"):
            J.jpeg_decode(dri)

        # truncation inside the scan (SOS header is 14 bytes; leave a
        # couple of entropy bytes so the reader starves mid-MCU)
        with pytest.raises(ValueError, match="truncated"):
            J.jpeg_decode(bytes(good[: sos + 16]))

        # not a JPEG at all
        with pytest.raises(ValueError, match="SOI"):
            J.jpeg_decode(b"GIF89a" + bytes(40))

        # T.81 B.1.1.2 fill bytes: 0xFF padding before a marker is
        # legal and must decode identically (other encoders emit it)
        dqt = find_marker(good, 0xDB)
        filled = bytes(good[:dqt]) + b"\xff\xff" + bytes(good[dqt:])
        base = J.jpeg_decode(bytes(good))
        import numpy as _np
        assert _np.array_equal(J.jpeg_decode(filled), base)

    def test_images_df_jpeg_transit(self, spark):
        """End-to-end through the Arrow lanes: a jpeg/png/rawv1 mix
        decodes, lossless lanes match the formula exactly, jpeg stays
        inside the gate bound."""
        from jepl_spark.functions import multimodal as M

        imgs = M.images_df(spark, 30, partitions=2,
                           fmt_cycle=("jpeg", "png", "rawv1"))
        errs = M.synth_roundtrip_errors(imgs).collect()
        assert len(errs) == 30
        for r in errs:
            if r["fmt"] == "jpeg":
                assert r["max_abs_err"] <= 32.0 and r["mean_abs_err"] <= 4.0
            else:
                assert r["max_abs_err"] == 0.0


def test_jpeg_decode_error_contract_fuzz():
    """Robustness contract: on ANY corruption (bit flips, truncation,
    garbage) jpeg_decode either succeeds or raises ValueError — never
    an internal IndexError/KeyError/struct.error — and a corrupt SOF
    size field cannot demand a pathological allocation."""
    import random

    from jepl_spark.functions.multimodal import _synth_pixels
    from jepl_spark.sources import jpeg as J

    good = J.jpeg_encode(_synth_pixels(3, 48, 24, 3), 90)
    rng = random.Random(7)
    for trial in range(400):
        buf = bytearray(good)
        mode = trial % 4
        if mode == 0:
            i = rng.randrange(len(buf)); buf[i] ^= rng.randrange(1, 256)
        elif mode == 1:
            buf = buf[:rng.randrange(2, len(buf))]
        elif mode == 2:
            for _ in range(rng.randrange(1, 8)):
                i = rng.randrange(len(buf)); buf[i] ^= rng.randrange(1, 256)
        else:
            buf = bytearray(b"\xff\xd8") + bytearray(
                rng.randrange(256) for _ in range(rng.randrange(5, 200)))
        try:
            J.jpeg_decode(bytes(buf))
        except ValueError:
            pass  # the ONLY allowed failure mode
    # oversized SOF: rejected before any allocation
    big = bytearray(good)
    sof = big.index(b"\xff\xc0")
    struct.pack_into(">HH", big, sof + 5, 65500, 65500)
    with pytest.raises(ValueError, match="max_pixels"):
        J.jpeg_decode(bytes(big))


def test_png_wav_decode_error_contract_fuzz():
    """Same robustness contract as jpeg_decode: corruption raises
    ValueError only — internal struct/zlib/index errors never leak."""
    import random

    px = np.arange(12 * 16 * 3, dtype=np.uint8).reshape(12, 16, 3)
    png = C.png_encode(px)
    wav = C.wav_encode(audio.synth_wave(3, 8000, 200), 8000, "pcm16")
    rng = random.Random(5)
    for good, dec in ((png, C.png_decode), (wav, lambda b: C.wav_decode(b))):
        for trial in range(200):
            buf = bytearray(good)
            if trial % 2:
                buf = buf[:rng.randrange(1, len(buf))]
            else:
                for _ in range(rng.randrange(1, 6)):
                    i = rng.randrange(len(buf))
                    buf[i] ^= rng.randrange(1, 256)
            try:
                dec(bytes(buf))
            except ValueError:
                pass  # the ONLY allowed failure mode


def test_wav_payload_span_decode_parity_on_truncation():
    """wav_payload_span and wav_decode share one chunk walk: a file
    whose data-chunk length overruns the buffer (truncated in
    transit) must PARSE IN BOTH — decode yields the available
    samples, the span clamps to the available bytes — and a masked
    splice through the span leaves the header bit-identical."""
    import numpy as np

    from jepl_spark.sources.containers import (
        wav_decode,
        wav_encode,
        wav_payload_span,
    )

    w = (0.5 * np.sin(np.arange(1600) / 4.0)).astype(np.float32)
    for codec, bps in (("ulaw", 1), ("pcm16", 2)):
        full = wav_encode(w, 8000, codec)
        cut = full[: len(full) - 100 * bps]     # drop 100 samples
        x, sr, inner = wav_decode(cut)
        assert (sr, inner) == (8000, codec)
        assert x.size == 1600 - 100
        c2, sr2, off, ln = wav_payload_span(cut)
        assert (c2, sr2) == (codec, 8000)
        assert ln == x.size * bps               # clamped, not raised
        assert off + ln == len(cut)
    # garbage still raises ValueError only
    import pytest as _pt
    with _pt.raises(ValueError):
        wav_payload_span(b"RIFFxxxxWAVE" + b"\x00" * 3)
    with _pt.raises(ValueError):
        wav_payload_span(b"not a wav at all")
