"""Pure-stdlib WAV (RIFF PCM) codec for the multimodal audio verbs.

WAV is decodable with nothing beyond the stdlib ``wave`` module and
``numpy`` for the sample math — no external audio library needed. The
engine uses this for the honest half of the audio pipeline: payloads
are *real* RIFF/WAVE files, the kernel genuinely parses the container
and the PCM frames, and only perceptual codecs (mp3/opus/…) remain
behind the NotImplementedError gate in functions/multimodal.py.
"""

from __future__ import annotations

import io
import wave

import numpy as np

DEFAULT_RATE = 16_000  # the ASR-pipeline default sample rate


def encode_wav_s16(samples: np.ndarray, rate: int = DEFAULT_RATE) -> bytes:
    """Encode mono int16 samples to WAV bytes via the stdlib writer."""
    arr = np.ascontiguousarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


WAVE_FORMAT_MULAW = 7  # RIFF fmt wFormatTag for G.711 µ-law


def mulaw_to_linear(codes: np.ndarray) -> np.ndarray:
    """G.711 µ-law expansion (ITU-T G.711 / the public Sun g711.c
    algorithm): transmitted bytes are ones'-complemented; the decoded
    magnitude is ``(((mantissa << 3) + 0x84) << exponent) − 0x84``.
    Pure integer arithmetic, so oracles can restate it exactly with
    SQL bit operators. Returns int16-range int64 samples (max
    magnitude 32124)."""
    u = (~np.asarray(codes, dtype=np.int64)) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84)


def encode_wav_mulaw(codes: np.ndarray, rate: int = 8_000) -> bytes:
    """Encode raw µ-law code bytes as a standard RIFF/WAVE file with
    wFormatTag 7 (one byte per sample). The stdlib ``wave`` module only
    writes PCM, so the container is assembled with ``struct`` — fmt
    (18-byte non-PCM form, cbSize 0) + the fact chunk non-PCM formats
    require + data."""
    import struct

    body = np.ascontiguousarray(codes, dtype=np.uint8).tobytes()
    fmt = struct.pack(
        "<HHIIHHH", WAVE_FORMAT_MULAW, 1, rate, rate, 1, 8, 0
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, len(body))
        + b"data" + struct.pack("<I", len(body)) + body
        + (b"\x00" if len(body) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav_mulaw(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a µ-law (wFormatTag 7) RIFF/WAVE file →
    ``(sample_rate, mono int16-range int64 samples)`` — a manual RIFF
    walk (the stdlib reader rejects non-PCM) + G.711 expansion of every
    code byte. Raises ``ValueError`` for non-µ-law or malformed
    containers."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = None
    nch = 1
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            wtag, nch, rate = struct.unpack("<HHI", body[:8])
            if wtag != WAVE_FORMAT_MULAW:
                raise ValueError(f"not a mu-law WAV (format {wtag})")
            if body[14] != 8:
                raise ValueError("mu-law samples must be 8-bit")
        elif tag == b"data":
            data = body
        pos += 8 + length + (length % 2)
    if rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    codes = np.frombuffer(data, dtype=np.uint8)
    if nch > 1:
        codes = codes[::nch]
    return rate, mulaw_to_linear(codes)


def decode_wav_s16(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode WAV bytes → ``(sample_rate, mono int16 samples)``.

    Multi-channel input is downmixed by taking channel 0 (deterministic,
    oracle-friendly). Raises ``wave.Error``/``ValueError`` on non-RIFF
    or non-PCM-16 payloads so callers can fall through to the
    NotImplementedError codec gate.
    """
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(f"only 16-bit PCM supported, got width {w.getsampwidth()}")
        rate = w.getframerate()
        nch = w.getnchannels()
        frames = w.readframes(w.getnframes())
    arr = np.frombuffer(frames, dtype="<i2")
    if nch > 1:
        arr = arr[::nch]
    return rate, arr
