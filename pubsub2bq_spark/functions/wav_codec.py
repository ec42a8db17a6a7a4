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


def wav_format_tag(payload: bytes) -> int | None:
    """The fmt chunk's wFormatTag of a RIFF/WAVE payload, or ``None``
    when the container is malformed / not WAVE / missing its fmt chunk.
    Used by dispatch chains to distinguish "unsupported codec" (a
    recognized container with a wFormatTag we have no decoder for — a
    NotImplementedError gate) from "malformed input" (ValueError)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        try:
            (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        except struct.error:
            return None
        if tag == b"fmt ":
            body = payload[pos + 8 : pos + 8 + length]
            if len(body) < 2:
                return None
            return struct.unpack("<H", body[:2])[0]
        pos += 8 + length + (length % 2)
    return None


# wFormatTags with a real decoder in this module (PCM16, G.711 µ/A-law,
# IMA ADPCM). Anything else in a well-formed WAV is an unsupported-codec
# gate, not a malformed file.
SUPPORTED_WAV_TAGS = frozenset({1, 6, 7, 0x11})


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


WAVE_FORMAT_ALAW = 6  # RIFF fmt wFormatTag for G.711 A-law


def alaw_to_linear(codes: np.ndarray) -> np.ndarray:
    """G.711 A-law expansion (ITU-T G.711 / the public Sun g711.c
    algorithm): transmitted bytes are XORed with 0x55 (alternate-bit
    inversion); segment 0 decodes to ``(mantissa << 4) + 8``, segment 1
    to ``(mantissa << 4) + 0x108``, higher segments shift that by
    ``seg − 1``; a SET sign bit means positive (the inverse of µ-law's
    convention). Pure integer arithmetic, so oracles restate it exactly
    with SQL bit operators. Returns int16-range int64 samples (max
    magnitude 32256)."""
    a = np.asarray(codes, dtype=np.int64) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    mag = np.where(
        seg == 0,
        t + 8,
        (t + 0x108) << np.maximum(seg - 1, 0),
    )
    return np.where(a & 0x80, mag, -mag)


def encode_wav_alaw(codes: np.ndarray, rate: int = 8_000) -> bytes:
    """Encode raw A-law code bytes as a standard RIFF/WAVE file with
    wFormatTag 6 (one byte per sample) — the same 18-byte non-PCM fmt +
    fact + data layout as the µ-law twin."""
    import struct

    body = np.ascontiguousarray(codes, dtype=np.uint8).tobytes()
    fmt = struct.pack(
        "<HHIIHHH", WAVE_FORMAT_ALAW, 1, rate, rate, 1, 8, 0
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, len(body))
        + b"data" + struct.pack("<I", len(body)) + body
        + (b"\x00" if len(body) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav_alaw(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode an A-law (wFormatTag 6) RIFF/WAVE file →
    ``(sample_rate, mono int16-range int64 samples)`` — a manual RIFF
    walk + G.711 A-law expansion of every code byte. Raises
    ``ValueError`` for non-A-law or malformed containers."""
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
            if wtag != WAVE_FORMAT_ALAW:
                raise ValueError(f"not an A-law WAV (format {wtag})")
            if body[14] != 8:
                raise ValueError("A-law samples must be 8-bit")
        elif tag == b"data":
            data = body
        pos += 8 + length + (length % 2)
    if rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    codes = np.frombuffer(data, dtype=np.uint8)
    if nch > 1:
        codes = codes[::nch]
    return rate, alaw_to_linear(codes)


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


WAVE_FORMAT_IMA_ADPCM = 0x11  # RIFF fmt wFormatTag for IMA/DVI ADPCM

# IMA ADPCM quantizer tables (public: IMA "Recommended Practices for
# Enhancing Digital Audio Compatibility", also RFC 3551 §4.5.1 and the
# Microsoft WAVE DVI/IMA ADPCM spec). 89 step sizes + the per-nibble
# step-index adjustment.
IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
], dtype=np.int64)

IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _clipped_add_scan(deltas: np.ndarray, x0: np.ndarray, lo: int,
                      hi: int) -> np.ndarray:
    """Prefix scan of the recurrence ``x_k = clip(x_{k-1} + d_k, lo,
    hi)`` along axis 1 of a (rows, n) delta array, vectorized (r14).

    The map family ``f(x) = min(h, max(l, x + a))`` is CLOSED under
    composition — ``g∘f`` has ``a' = a_f + a_g``, ``l' = clip(l_f + a_g,
    l_g, h_g)``, ``h' = clip(h_f + a_g, l_g, h_g)`` — so the whole chain
    folds in ⌈log2 n⌉ numpy passes of pairwise composition (the same
    prefix-doubling discipline as the FLAC Rice decoder). Returns the
    (rows, n) array of post-update states."""
    rows, n = deltas.shape
    A = deltas.astype(np.int64).copy()
    LO = np.full((rows, n), lo, dtype=np.int64)
    HI = np.full((rows, n), hi, dtype=np.int64)
    s = 1
    while s < n:
        a_r, lo_r, hi_r = A[:, s:], LO[:, s:], HI[:, s:]
        new_lo = np.minimum(hi_r, np.maximum(lo_r, LO[:, :-s] + a_r))
        new_hi = np.minimum(hi_r, np.maximum(lo_r, HI[:, :-s] + a_r))
        new_a = A[:, :-s] + a_r
        A[:, s:] = new_a
        LO[:, s:] = new_lo
        HI[:, s:] = new_hi
        s <<= 1
    return np.minimum(HI, np.maximum(LO, x0[:, None] + A))


def _ima_decode_nibbles(nibbles: np.ndarray, pred: int, index: int) -> np.ndarray:
    """Decode an IMA ADPCM nibble stream given the block header state.

    r14: the textbook recurrence has TWO clipped running sums — the
    step index (depends only on the nibbles) and the predictor (whose
    per-sample delta is fixed once the step sequence is known) — and a
    clipped running sum is a composition of ``clip(x + a)`` maps, which
    vectorizes by prefix doubling (:func:`_clipped_add_scan`). Bit-exact
    with the scalar loop (pure integer arithmetic throughout). The block
    header's predictor is NOT included in the returned array; callers
    prepend it as sample 0 per the WAV IMA block layout."""
    nibs = np.asarray(nibbles, dtype=np.int64).reshape(1, -1)
    if nibs.size == 0:
        return np.empty(0, dtype=np.int64)
    idx = _clipped_add_scan(IMA_INDEX_TABLE[nibs & 7],
                            np.array([index], dtype=np.int64), 0, 88)
    # step for nibble k uses the index BEFORE its own update
    prev_idx = np.concatenate(
        [np.array([[index]], dtype=np.int64), idx[:, :-1]], axis=1
    )
    step = IMA_STEP_TABLE[prev_idx]
    diff = (
        (step >> 3)
        + np.where(nibs & 1, step >> 2, 0)
        + np.where(nibs & 2, step >> 1, 0)
        + np.where(nibs & 4, step, 0)
    )
    delta = np.where(nibs & 8, -diff, diff)
    out = _clipped_add_scan(
        delta, np.array([pred], dtype=np.int64), -32768, 32767
    )
    return out.reshape(-1)


def encode_wav_adpcm(samples: np.ndarray, rate: int = 8_000,
                     block_samples: int = 505) -> bytes:
    """Encode mono int16 samples as a standard IMA ADPCM WAV
    (wFormatTag 0x11): per-block 4-byte header (initial predictor
    int16, step index uint8, reserved) followed by packed 4-bit codes,
    low nibble first. ``block_samples`` must be odd (header predictor
    is sample 0 of each block; the remaining ``block_samples - 1``
    samples become nibbles, two per byte)."""
    if block_samples % 2 != 1:
        raise ValueError("block_samples must be odd (header carries sample 0)")
    arr = np.asarray(samples, dtype=np.int64)
    index = 0
    blocks = []
    total = arr.size
    for start in range(0, total, block_samples):
        block = arr[start:start + block_samples]
        pred = int(block[0])
        index_at_start = index  # header carries the BLOCK-START state
        nibbles = []
        for s in block[1:]:
            step = int(IMA_STEP_TABLE[index])
            diff = int(s) - pred
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            # decoder-mirrored reconstruction keeps encoder state exact
            step_out = step >> 3
            if nib & 1:
                step_out += step >> 2
            if nib & 2:
                step_out += step >> 1
            if nib & 4:
                step_out += step
            pred = pred - step_out if nib & 8 else pred + step_out
            pred = max(-32768, min(32767, pred))
            index = max(0, min(88, index + int(IMA_INDEX_TABLE[nib & 7])))
            nibbles.append(nib)
        if len(nibbles) % 2:
            nibbles.append(0)  # pad the final byte's high nibble
        packed = bytes(
            (nibbles[i] & 0xF) | ((nibbles[i + 1] & 0xF) << 4)
            for i in range(0, len(nibbles), 2)
        )
        blocks.append(
            struct_pack_ima_header(int(block[0]), index_at_start) + packed
        )
    block_align = 4 + (block_samples - 1) // 2
    return _assemble_adpcm_wav(blocks, rate, block_align, block_samples, total)


def struct_pack_ima_header(pred: int, index: int) -> bytes:
    import struct

    return struct.pack("<hBB", pred, index, 0)


def _assemble_adpcm_wav(blocks: list[bytes], rate: int, block_align: int,
                        block_samples: int, total_samples: int) -> bytes:
    """RIFF/WAVE container for wFormatTag 0x11: 20-byte fmt (cbSize 2 +
    wSamplesPerBlock) + the fact chunk non-PCM formats require + data."""
    import struct

    body = b"".join(blocks)
    avg_bytes = (rate * block_align + block_samples - 1) // max(block_samples, 1)
    fmt = struct.pack(
        "<HHIIHHHH", WAVE_FORMAT_IMA_ADPCM, 1, rate, avg_bytes,
        block_align, 4, 2, block_samples,
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, total_samples)
        + b"data" + struct.pack("<I", len(body)) + body
        + (b"\x00" if len(body) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav_adpcm(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode an IMA ADPCM (wFormatTag 0x11) RIFF/WAVE file →
    ``(sample_rate, mono int64 samples)``: manual RIFF walk, then the
    full public IMA recurrence per block — header predictor emitted as
    sample 0, every nibble (low first) quantizer-expanded with step
    adaptation and int16 clamping. The fact chunk's sample count trims
    final-byte padding. Raises ``ValueError`` for non-ADPCM or
    malformed containers."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = block_align = samples_per_block = None
    fact_samples = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            wtag, nch, rate, _avg, block_align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if wtag != WAVE_FORMAT_IMA_ADPCM:
                raise ValueError(f"not an IMA ADPCM WAV (format {wtag})")
            if nch != 1 or bits != 4:
                raise ValueError("only mono 4-bit IMA ADPCM supported")
            if length >= 20:
                (samples_per_block,) = struct.unpack("<H", body[18:20])
        elif tag == b"fact":
            (fact_samples,) = struct.unpack("<I", body[:4])
        elif tag == b"data":
            data = body
        pos += 8 + length + (length % 2)
    if rate is None or data is None or not block_align:
        raise ValueError("WAV missing fmt or data chunk")
    out: list[np.ndarray] = []
    for start in range(0, len(data), block_align):
        block = data[start : start + block_align]
        if len(block) < 4:
            raise ValueError("truncated IMA ADPCM block header")
        pred, index, _rsvd = struct.unpack("<hBB", block[:4])
        if index > 88:
            raise ValueError(f"IMA step index {index} out of range")
        packed = np.frombuffer(block[4:], dtype=np.uint8)
        nibbles = np.empty(packed.size * 2, dtype=np.uint8)
        nibbles[0::2] = packed & 0xF
        nibbles[1::2] = packed >> 4
        out.append(np.concatenate((
            np.array([pred], dtype=np.int64),
            _ima_decode_nibbles(nibbles, int(pred), int(index)),
        )))
    samples = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
    if fact_samples is not None:
        samples = samples[:fact_samples]
    return rate, samples


def _f80_pack(v: int) -> bytes:
    """Pack a positive integer as an 80-bit IEEE 754 extended float —
    the AIFF COMM sample-rate field."""
    if v == 0:
        return b"\x00" * 10
    exp = v.bit_length() - 1
    mant = v << (63 - exp)
    return struct_pack_be_f80(16383 + exp, mant)


def struct_pack_be_f80(se: int, mant: int) -> bytes:
    import struct

    return struct.pack(">HQ", se, mant)


def _f80_unpack(b: bytes) -> int:
    """Unpack an 80-bit extended float to the nearest integer (sample
    rates are exact integers in practice)."""
    import struct

    se, mant = struct.unpack(">HQ", b)
    exp = (se & 0x7FFF) - 16383
    if mant == 0:
        return 0
    v = mant / (1 << 63) * (2 ** exp)
    return int(round(-v if se & 0x8000 else v))


def encode_aiff(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """Encode mono int16 samples as a standard AIFF file (Apple's IFF
    container: big-endian FORM/AIFF with COMM — channels, frame count,
    bit depth, 80-bit-extended sample rate — and SSND PCM16 data)."""
    import struct

    arr = np.ascontiguousarray(samples, dtype=">i2")
    comm = struct.pack(">hIh", 1, arr.size, 16) + _f80_pack(rate)
    ssnd = struct.pack(">II", 0, 0) + arr.tobytes()
    body = (
        b"AIFF"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
        + (b"\x00" if len(ssnd) % 2 else b"")
    )
    return b"FORM" + struct.pack(">I", len(body)) + body


def decode_aiff(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode an AIFF (PCM16) file → ``(sample_rate, mono int64
    samples)``: big-endian IFF chunk walk, COMM (incl. the 80-bit
    extended sample rate) + SSND. Multi-channel takes channel 0."""
    import struct

    if payload[:4] != b"FORM" or payload[8:12] != b"AIFF":
        raise ValueError("not an AIFF payload")
    pos = 12
    rate = nch = bits = None
    nframes = 0
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack(">I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"COMM":
            nch, nframes, bits = struct.unpack(">hIh", body[:8])
            rate = _f80_unpack(body[8:18])
        elif tag == b"SSND":
            (offset, _blk) = struct.unpack(">II", body[:8])
            data = body[8 + offset :]
        pos += 8 + length + (length % 2)
    if rate is None or data is None:
        raise ValueError("AIFF missing COMM or SSND chunk")
    if bits != 16:
        raise NotImplementedError("aiff: only 16-bit PCM supported")
    arr = np.frombuffer(data, dtype=">i2")[: nframes * nch].astype(np.int64)
    if nch and nch > 1:
        arr = arr[::nch]
    return rate, arr
