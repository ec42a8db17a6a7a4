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
