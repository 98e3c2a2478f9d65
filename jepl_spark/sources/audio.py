"""Deterministic audio synthesis + codecs (numpy, driver/executor side).

Everything here is seeded and pure-numpy: the sandbox has no audio
libraries and the north rule forbids external data, so clips are
synthesized waveforms (sine + harmonic + chirp, parameters derived from
the clip index) encoded with three real codecs:

- ``pcm16``: 16-bit little-endian linear PCM (lossless to 1/32768)
- ``ulaw``: G.711 µ-law companding, 8-bit (standard segmented encoder;
  round-trip SNR ≈ 35-40 dB on speech-like signals)
- ``alaw``: G.711 A-law companding, 8-bit

The per-row invariant used by tests (BASELINE.json input_hint):
decode(encode(x)) vs x allclose at SNR ≥ 30 dB + exact transcript
equality.
"""

from __future__ import annotations

import hashlib

import numpy as np

CODECS = ("pcm16", "ulaw", "alaw")

_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635


# -- synthesis ----------------------------------------------------------------


def clip_params(i: int) -> dict:
    """Deterministic synthesis parameters for clip index i."""
    h = int.from_bytes(
        hashlib.sha256(f"clip-{i:012d}".encode()).digest()[:8], "little"
    )
    return {
        "f0": 100.0 + (h % 1900),                  # base frequency 100-2000 Hz
        "f1_ratio": 1.5 + ((h >> 16) % 100) / 50.0,  # harmonic ratio
        "chirp": ((h >> 24) % 200) - 100.0,        # Hz/s sweep
        "phase": ((h >> 32) % 628) / 100.0,
        "amp": 0.3 + ((h >> 40) % 60) / 100.0,     # 0.3-0.9
    }


def synth_wave(i: int, sr_hz: int, dur_ms: int) -> np.ndarray:
    """Float32 waveform in [-1, 1], fully determined by (i, sr, dur)."""
    p = clip_params(i)
    n = int(sr_hz * dur_ms / 1000)
    t = np.arange(n, dtype=np.float64) / sr_hz
    x = (
        0.7 * np.sin(2 * np.pi * (p["f0"] + p["chirp"] * t) * t + p["phase"])
        + 0.3 * np.sin(2 * np.pi * p["f0"] * p["f1_ratio"] * t)
    )
    return (p["amp"] * x).astype(np.float32)


# -- linear PCM ----------------------------------------------------------------


def float_to_int16(x: np.ndarray) -> np.ndarray:
    return np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int16)


def int16_to_float(x: np.ndarray) -> np.ndarray:
    return (x.astype(np.float32)) / 32768.0


def pcm16_encode(x: np.ndarray) -> bytes:
    return float_to_int16(x).astype("<i2").tobytes()


def pcm16_decode(b: bytes) -> np.ndarray:
    return int16_to_float(np.frombuffer(b, dtype="<i2"))


# -- G.711 µ-law -----------------------------------------------------------------


def _msb_exponent(mag: np.ndarray, low_bit: int) -> np.ndarray:
    """Segment number: position of the MSB above ``low_bit`` (0-7)."""
    e = np.zeros_like(mag)
    v = mag >> (low_bit + 1)
    for _ in range(7):
        nz = v > 0
        e = e + nz.astype(mag.dtype)
        v = v >> 1
    return np.minimum(e, 7)


def ulaw_encode(x: np.ndarray) -> bytes:
    pcm = float_to_int16(x).astype(np.int32)
    sign = np.where(pcm < 0, 0x80, 0x00)
    mag = np.minimum(np.abs(pcm), _ULAW_CLIP) + _ULAW_BIAS
    exponent = _msb_exponent(mag, 7)
    mantissa = (mag >> (exponent + 3)) & 0x0F
    code = ~(sign | (exponent << 4) | mantissa) & 0xFF
    return code.astype(np.uint8).tobytes()


def ulaw_decode(b: bytes) -> np.ndarray:
    u = (~np.frombuffer(b, dtype=np.uint8).astype(np.int32)) & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    mag = (((mantissa << 3) + _ULAW_BIAS) << exponent) - _ULAW_BIAS
    pcm = np.where(sign > 0, -mag, mag).astype(np.int16)
    return int16_to_float(pcm)


# -- G.711 A-law ------------------------------------------------------------------


def alaw_encode(x: np.ndarray) -> bytes:
    pcm = float_to_int16(x).astype(np.int32)
    mask = np.where(pcm >= 0, 0xD5, 0x55)
    mag = np.minimum(np.abs(pcm), 32767)
    # segment e≥1 covers [256<<(e-1), 256<<e); mantissa is the next 4
    # bits below the MSB: (mag >> (e+3)) & 0xF
    exponent = _msb_exponent(mag, 7)
    big = mag >= 256
    mantissa = np.where(big, (mag >> (exponent + 3)) & 0x0F, mag >> 4)
    code = np.where(big, (exponent << 4) | mantissa, mantissa)
    return ((code ^ mask) & 0xFF).astype(np.uint8).tobytes()


def alaw_decode(b: bytes) -> np.ndarray:
    a = (np.frombuffer(b, dtype=np.uint8).astype(np.int32)) ^ 0x55
    sign = a & 0x80
    exponent = (a & 0x70) >> 4
    mantissa = a & 0x0F
    mag = np.where(
        exponent == 0,
        (mantissa << 4) + 8,
        ((mantissa << 4) + 0x108) << np.maximum(exponent - 1, 0),
    )
    pcm = np.where(sign > 0, mag, -mag).astype(np.int16)
    return int16_to_float(pcm)


_ENCODERS = {"pcm16": pcm16_encode, "ulaw": ulaw_encode, "alaw": alaw_encode}
_DECODERS = {"pcm16": pcm16_decode, "ulaw": ulaw_decode, "alaw": alaw_decode}


def encode(x: np.ndarray, codec: str) -> bytes:
    return _ENCODERS[codec](x)


def decode(b: bytes, codec: str) -> np.ndarray:
    if codec == "wav":
        # real RIFF/WAVE container (sources/containers): sample rate
        # and inner codec come from the file itself.  Lazy import —
        # containers.py imports this module for the payload codecs.
        from jepl_spark.sources.containers import wav_decode

        return wav_decode(b)[0]
    return _DECODERS[codec](b)


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of ``test`` against reference, in dB."""
    ref = ref.astype(np.float64)
    test = test.astype(np.float64)
    noise = ref - test
    p_sig = float(np.mean(ref**2))
    p_noise = float(np.mean(noise**2))
    if p_noise == 0.0:
        return float("inf")
    return 10.0 * np.log10(p_sig / p_noise)
