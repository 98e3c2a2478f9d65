"""Real file-container codecs, pure stdlib + numpy: PNG for images and
RIFF/WAVE for audio.

The sandbox ships no media libraries, but these two containers need
none — PNG is zlib (stdlib) + byte filters, WAV is a chunked header
around the G.711/PCM payloads the audio lane already implements
(sources/audio.py).  With them, GENUINE image/audio file bytes transit
the Arrow decode lane end-to-end instead of only the deterministic
RAWv1/raw-payload fixture formats: any standards-conforming reader
(browser, PIL, ffmpeg) can open what we encode, and we can decode what
they produce (8-bit non-interlaced PNG; 16-bit PCM / G.711 mono WAV).

Scale shape: both codecs run inside the same Arrow-batched
``mapInPandas``/pandas-UDF workers as the fixture formats — per-file
numpy + zlib, no per-row Python plan nodes, no shuffle.

PNG support: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+
alpha), 6 (RGBA), interlace 0; all five scanline filters on decode
(encoders in the wild emit Sub/Up/Average/Paeth), filter 0 on encode;
chunk CRCs verified.  WAV support: mono, format codes 1 (PCM16),
6 (A-law), 7 (µ-law) — the three codecs of the clips table — with a
spec-required ``fact`` chunk for the non-PCM formats.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from jepl_spark.sources import audio

# -- PNG ----------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels → PNG color type (and back)
_COLOR_OF_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}
_CHANNELS_OF_COLOR = {0: 1, 4: 2, 2: 3, 6: 4}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray, level: int = 6) -> bytes:
    """Encode an (h, w) or (h, w, c) uint8 array as a real PNG file
    (8-bit, non-interlaced, filter 0 scanlines)."""
    if pixels.dtype != np.uint8:
        raise ValueError(f"png_encode needs uint8 pixels, got {pixels.dtype}")
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    if c not in _COLOR_OF_CHANNELS:
        raise ValueError(f"unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_OF_CHANNELS[c], 0, 0, 0)
    # one filter byte (0 = None) prepended to every scanline
    lines = np.empty((h, 1 + w * c), dtype=np.uint8)
    lines[:, 0] = 0
    lines[:, 1:] = pixels.reshape(h, w * c)
    idat = zlib.compress(lines.tobytes(), level)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(buf: bytes) -> np.ndarray:
    """Decode PNG bytes to an (h, w, c) uint8 array.  Verifies chunk
    CRCs; handles all five scanline filters; rejects interlaced /
    non-8-bit / palette images explicitly.  Error contract: any
    corruption raises ValueError — internal struct/zlib/index errors
    never leak (fuzz-pinned)."""
    try:
        return _png_decode_impl(buf)
    except ValueError:
        raise
    except (struct.error, zlib.error, IndexError, KeyError,
            OverflowError) as e:
        raise ValueError(
            f"corrupt or unsupported PNG ({type(e).__name__}: {e})"
        ) from e


def _png_decode_impl(buf: bytes) -> np.ndarray:
    if bytes(buf[:8]) != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    n = len(buf)
    while pos + 8 <= n:
        (ln,) = struct.unpack_from(">I", buf, pos)
        ctype = bytes(buf[pos + 4 : pos + 8])
        data = bytes(buf[pos + 8 : pos + 8 + ln])
        (crc,) = struct.unpack_from(">I", buf, pos + 8 + ln)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or interlace != 0 or comp != 0 or filt != 0:
        raise ValueError(
            f"unsupported PNG shape (depth={depth}, interlace={interlace})"
        )
    if color not in _CHANNELS_OF_COLOR:
        raise ValueError(f"unsupported PNG color type {color} (palette?)")
    c = _CHANNELS_OF_COLOR[color]
    stride = w * c
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    raw = raw.reshape(h, stride + 1)
    out = np.empty((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        f = int(raw[r, 0])
        line = raw[r, 1:].astype(np.int32)
        prior = out[r - 1].astype(np.int32) if r else zero
        if f == 0:  # None
            rec = line
        elif f == 1:  # Sub — per-phase cumulative sum mod 256
            rec = line.copy()
            for p in range(c):
                rec[p::c] = np.cumsum(rec[p::c], dtype=np.int64) & 255
        elif f == 2:  # Up
            rec = (line + prior) & 255
        elif f == 3:  # Average (sequential in the left neighbor)
            rec = line
            for i in range(stride):
                left = rec[i - c] if i >= c else 0
                rec[i] = (rec[i] + ((left + prior[i]) >> 1)) & 255
        elif f == 4:  # Paeth
            rec = line
            for i in range(stride):
                left = int(rec[i - c]) if i >= c else 0
                ul = int(prior[i - c]) if i >= c else 0
                rec[i] = (rec[i] + _paeth(left, int(prior[i]), ul)) & 255
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[r] = rec.astype(np.uint8)
    return out.reshape(h, w, c)


# -- RIFF / WAVE --------------------------------------------------------------

# WAVE format codes for the three codecs the clips table uses
_WAV_FMT_OF_CODEC = {"pcm16": 1, "alaw": 6, "ulaw": 7}
_CODEC_OF_WAV_FMT = {v: k for k, v in _WAV_FMT_OF_CODEC.items()}
_BITS_OF_CODEC = {"pcm16": 16, "alaw": 8, "ulaw": 8}


def wav_encode(x: np.ndarray, sr_hz: int, codec: str = "pcm16") -> bytes:
    """Encode mono float samples as a real RIFF/WAVE file whose data
    payload is the named codec (pcm16 / G.711 ulaw / alaw)."""
    if codec not in _WAV_FMT_OF_CODEC:
        # before audio.encode, whose dict lookup would leak KeyError —
        # codec errors are ValueError everywhere in this package
        raise ValueError(f"unsupported WAV codec {codec!r}")
    return wav_wrap(audio.encode(x, codec), sr_hz, codec)


def wav_wrap(payload: bytes, sr_hz: int, codec: str = "pcm16") -> bytes:
    """Wrap ALREADY-ENCODED payload bytes in a RIFF/WAVE container —
    the exactness-preserving path for encoded-domain editors (trim /
    splice): no decode→encode roundtrip touches the samples."""
    if codec not in _WAV_FMT_OF_CODEC:
        raise ValueError(f"unsupported WAV codec {codec!r}")
    bits = _BITS_OF_CODEC[codec]
    block_align = bits // 8  # mono
    fmt = struct.pack(
        "<HHIIHH",
        _WAV_FMT_OF_CODEC[codec],
        1,  # channels: mono
        int(sr_hz),
        int(sr_hz) * block_align,
        block_align,
        bits,
    )
    if codec != "pcm16":
        # non-PCM formats require the EXTENDED fmt chunk (size 18,
        # cbSize=0) — strict decoders reject a bare 16-byte fmt for
        # format codes 6/7
        fmt += struct.pack("<H", 0)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if codec != "pcm16":  # non-PCM formats also require a fact chunk
        chunks += b"fact" + struct.pack("<II", 4, len(payload) // block_align)
    data = payload + (b"\x00" if len(payload) % 2 else b"")  # pad to even
    chunks += b"data" + struct.pack("<I", len(payload)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_decode(buf: bytes) -> tuple[np.ndarray, int, str]:
    """Decode WAV bytes → (float samples, sample rate, inner codec).
    Walks chunks (unknown ones skipped), mono only.  Error contract:
    any corruption raises ValueError — internal struct/index errors
    never leak (fuzz-pinned)."""
    try:
        return _wav_decode_impl(buf)
    except ValueError:
        raise
    except (struct.error, IndexError, KeyError, OverflowError) as e:
        raise ValueError(
            f"corrupt or unsupported WAV ({type(e).__name__}: {e})"
        ) from e


def wav_payload_span(buf: bytes) -> tuple[str, int, int, int]:
    """Locate the data chunk WITHOUT decoding: → (inner codec,
    sample rate, payload byte offset, payload byte length).  Lets
    encoded-domain editors (e.g. time masking) splice samples in
    place while every other byte of the container stays bit-identical.

    This is THE chunk walk — wav_decode is implemented on top of it,
    so the two can never diverge on which files parse.  A chunk
    length that overruns the buffer is clamped to the available bytes
    (wav_decode's long-standing tolerance: a file truncated in
    transit decodes — and splices — its available samples).  Same
    ValueError-only contract as wav_decode."""
    try:
        if bytes(buf[:4]) != b"RIFF" or bytes(buf[8:12]) != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        pos, n = 12, len(buf)
        fmt_code = sr = channels = None
        span = None
        while pos + 8 <= n:
            cid = bytes(buf[pos : pos + 4])
            (ln,) = struct.unpack_from("<I", buf, pos + 4)
            if cid == b"fmt ":
                fmt_code, channels, sr = struct.unpack_from(
                    "<HHI", bytes(buf[pos + 8 : pos + 8 + ln]), 0
                )
            elif cid == b"data":
                span = (pos + 8, min(ln, n - pos - 8))
            pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if fmt_code is None or span is None:
            raise ValueError("WAV missing fmt/data chunk")
        if channels != 1:
            raise ValueError(
                f"only mono WAV supported, got {channels} channels"
            )
        if fmt_code not in _CODEC_OF_WAV_FMT:
            raise ValueError(f"unsupported WAV format code {fmt_code}")
        return _CODEC_OF_WAV_FMT[fmt_code], int(sr), span[0], span[1]
    except ValueError:
        raise
    except (struct.error, IndexError, KeyError, OverflowError) as e:
        raise ValueError(
            f"corrupt or unsupported WAV ({type(e).__name__}: {e})"
        ) from e


def _wav_decode_impl(buf: bytes) -> tuple[np.ndarray, int, str]:
    codec, sr, off, ln = wav_payload_span(buf)
    return audio.decode(bytes(buf[off : off + ln]), codec), sr, codec
