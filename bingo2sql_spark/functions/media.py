"""Pure-numpy/stdlib media codecs for the multimodal pipeline.

The container ships no media libraries (no PIL/cv2/soundfile/ffmpeg),
but several production formats are decodable with numpy + the standard
library alone, which lets the multimodal operators do REAL codec work
instead of stubbing everything:

- **BMP** (Windows DIB, uncompressed 24/32-bit) — decode + encode in
  numpy. The bytes produced here open in any image viewer.
- **PPM/PGM** (netpbm P6/P5) — decode + encode in numpy.
- **WAV** (RIFF PCM, 8/16/32-bit) — stdlib ``wave`` + numpy.
- **FRMS** — a tiny length-prefixed frame container defined HERE (magic
  ``FRMS``; per frame: ts_ms u64 LE, payload length u32 LE, payload =
  any encoded image, typically BMP). Real video containers (MP4/WebM)
  need ffmpeg/av and stay import-gated in ``operators.multimodal``;
  FRMS gives frame-sampling a genuinely decodable on-disk shape so the
  1:N fan-out path is exercised on real bytes, not slices.

Everything here is plain bytes -> numpy -> bytes: no Spark imports, so
the functions serialize cheaply into Arrow-batched ``mapInPandas``
workers. Compressed formats (JPEG/PNG/FLAC/MP4) are NOT handled here —
``operators.multimodal.decode_image/decode_audio`` try PIL/soundfile
first and fall back to these codecs by magic-byte sniffing.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# ---------------------------------------------------------------------------
# sniffing


def sniff_mime(data: bytes) -> str | None:
    """Best-effort container detection from magic bytes. Returns a mime
    string for formats this module can decode, a generic mime for
    well-known compressed formats (so callers can route to import-gated
    libs), or None."""
    if not data or len(data) < 4:
        return None
    if data[:2] == b"BM":
        return "image/bmp"
    if data[:2] in (b"P5", b"P6") and data[2:3] in (b"\n", b" ", b"\t", b"\r"):
        return "image/x-portable-pixmap" if data[:2] == b"P6" else "image/x-portable-graymap"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "audio/wav"
    if data[:4] == b"FRMS":
        return "video/x-frms"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if data[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "video/mp4"
    return None


# ---------------------------------------------------------------------------
# BMP (uncompressed BITMAPINFOHEADER, 24/32 bpp)


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit uncompressed BMP.
    Rows are written bottom-up with 4-byte padding per the format."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"encode_bmp wants (H, W, 3) uint8, got {arr.shape}")
    h, w = arr.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # RGB -> BGR, bottom-up
    bgr = arr[::-1, :, ::-1]
    rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    pixel_data = rows.tobytes()
    data_offset = 14 + 40
    file_size = data_offset + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return header + dib + pixel_data


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BMP to an (H, W, 3) uint8 RGB
    array. Handles bottom-up (positive height) and top-down (negative)
    row order and the 4-byte row padding."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", data, 10)[0]
    dib_size = struct.unpack_from("<I", data, 14)[0]
    if dib_size < 40:
        raise ValueError(f"unsupported BMP DIB header size {dib_size}")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression not in (0, 3) or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    top_down = h_signed < 0
    h = abs(h_signed)
    bytes_pp = bpp // 8
    row_bytes = w * bytes_pp
    stride = row_bytes + ((-row_bytes) % 4) if bpp == 24 else row_bytes
    need = data_offset + stride * h
    if len(data) < need:
        raise ValueError(f"truncated BMP: {len(data)} bytes, need {need}")
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=data_offset)
    rows = raw.reshape(h, stride)[:, :row_bytes].reshape(h, w, bytes_pp)
    rgb = rows[:, :, 2::-1]  # BGR(A) -> RGB
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


# ---------------------------------------------------------------------------
# netpbm (P5 gray / P6 rgb, binary, maxval <= 255)


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode (H, W, 3) uint8 as binary PPM (P6), or (H, W) as PGM (P5)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    elif arr.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"encode_ppm wants (H, W, 3) or (H, W), got {arr.shape}")
    h, w = arr.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode binary PPM (P6 -> (H, W, 3)) or PGM (P5 -> (H, W, 3) by
    channel replication), maxval <= 255, with comment support."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    channels = 3 if data[:2] == b"P6" else 1
    pos, fields = 2, []
    while len(fields) < 3:
        # skip whitespace and '#' comments between header fields
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            pos = data.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    n = w * h * channels
    raw = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    if channels == 1:
        return np.repeat(raw.reshape(h, w)[:, :, None], 3, axis=2)
    return raw.reshape(h, w, 3).copy()


def decode_image_np(data: bytes) -> np.ndarray:
    """Decode any numpy-decodable image payload (BMP or netpbm) to
    (H, W, 3) uint8 RGB. Raises ValueError on unknown formats."""
    mime = sniff_mime(data)
    if mime == "image/bmp":
        return decode_bmp(data)
    if mime in ("image/x-portable-pixmap", "image/x-portable-graymap"):
        return decode_ppm(data)
    raise ValueError(f"no numpy codec for payload (sniffed {mime!r})")


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy index maps — the standard
    pixel-center mapping (same grid as OpenCV INTER_NEAREST)."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(height) * (h / height)).astype(np.int64), h - 1)
    xs = np.minimum((np.arange(width) * (w / width)).astype(np.int64), w - 1)
    return arr[ys[:, None], xs[None, :]]


# ---------------------------------------------------------------------------
# WAV (RIFF PCM via stdlib wave)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode a 1-D (mono) or (N, C) int16 array as PCM WAV."""
    samples = np.asarray(samples, dtype=np.int16)
    n_channels = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(n_channels)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV -> (samples float32 in [-1, 1] shaped (N,) mono or
    (N, C), sample_rate). 8/16/32-bit PCM via stdlib wave. Malformed
    RIFF/WAVE payloads raise ValueError (module convention), not the
    stdlib's wave.Error/EOFError."""
    try:
        with wave.open(io.BytesIO(data), "rb") as wf:
            n_channels = wf.getnchannels()
            width = wf.getsampwidth()
            rate = wf.getframerate()
            frames = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError, struct.error, RuntimeError) as e:
        # RuntimeError: stdlib chunk reader raises it bare on bogus sizes
        raise ValueError(f"malformed WAV payload: {e}") from e
    if width == 2:
        arr = np.frombuffer(frames, dtype=np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        arr = np.frombuffer(frames, dtype=np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:  # unsigned 8-bit per the WAV spec
        arr = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    if n_channels > 1:
        arr = arr.reshape(-1, n_channels)
    return arr, rate


def spectrogram(
    samples: np.ndarray, n_fft: int = 256, hop: int = 128
) -> np.ndarray:
    """Magnitude spectrogram |STFT| with a Hann window — numpy only.
    Returns (n_frames, n_fft // 2 + 1) float32. Mono input (mix down
    multi-channel first)."""
    x = np.asarray(samples, dtype=np.float32)
    if x.ndim > 1:
        x = x.mean(axis=1)
    if len(x) < n_fft:
        x = np.pad(x, (0, n_fft - len(x)))
    window = np.hanning(n_fft).astype(np.float32)
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    return np.abs(np.fft.rfft(x[idx] * window, axis=1)).astype(np.float32)


def audio_features(samples: np.ndarray, rate: int) -> dict[str, float]:
    """Classic DSP summary features: RMS level, zero-crossing rate, and
    spectral centroid (Hz). Real measurements — a pure tone's centroid
    lands on the tone frequency (pinned by tests)."""
    x = np.asarray(samples, dtype=np.float32)
    if x.ndim > 1:
        x = x.mean(axis=1)
    if len(x) == 0:
        return {"rms": 0.0, "zcr": 0.0, "centroid_hz": 0.0, "duration_ms": 0.0}
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
    spec = spectrogram(x).mean(axis=0)
    freqs = np.fft.rfftfreq(256, d=1.0 / rate)
    total = float(spec.sum())
    centroid = float((freqs * spec).sum() / total) if total > 0 else 0.0
    return {
        "rms": rms,
        "zcr": zcr,
        "centroid_hz": centroid,
        "duration_ms": 1000.0 * len(x) / rate,
    }


# ---------------------------------------------------------------------------
# FRMS — length-prefixed frame container (defined by this module)

_FRMS_MAGIC = b"FRMS"


def pack_frames(frames: list[tuple[int, bytes]]) -> bytes:
    """Pack [(ts_ms, encoded_image_bytes), ...] into an FRMS payload."""
    out = [_FRMS_MAGIC, struct.pack("<I", len(frames))]
    for ts_ms, payload in frames:
        out.append(struct.pack("<QI", ts_ms, len(payload)))
        out.append(payload)
    return b"".join(out)


def unpack_frames(data: bytes) -> list[tuple[int, bytes]]:
    """Unpack an FRMS payload to [(ts_ms, encoded_image_bytes), ...].

    The u32 frame count and per-frame lengths are untrusted: every
    header and payload extent is bounds-checked against len(data), and
    any overrun raises ValueError('truncated FRMS') — never struct.error
    and never silently-short frame bytes."""
    if data[:4] != _FRMS_MAGIC:
        raise ValueError("not an FRMS payload")
    if len(data) < 8:
        raise ValueError("truncated FRMS")
    (count,) = struct.unpack_from("<I", data, 4)
    pos, frames = 8, []
    for _ in range(count):
        if pos + 12 > len(data):
            raise ValueError("truncated FRMS")
        ts_ms, length = struct.unpack_from("<QI", data, pos)
        pos += 12
        if pos + length > len(data):
            raise ValueError("truncated FRMS")
        frames.append((ts_ms, data[pos : pos + length]))
        pos += length
    return frames


def frame_at(data: bytes, ts_ms: int) -> bytes | None:
    """The frame whose timestamp is the latest <= ts_ms (video seek
    semantics); the first frame when ts_ms precedes all frames."""
    best = None
    for f_ts, payload in unpack_frames(data):
        if f_ts <= ts_ms or best is None:
            best = payload
        if f_ts > ts_ms:
            break
    return best
