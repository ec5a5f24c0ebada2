"""Pure-bytes media codecs for the uncompressed members of each media
family — no image/audio libraries required, only numpy.

These are REAL decoders for real public formats, not stand-ins:

- WAV (RIFF / PCM16)  — audio;  spec: RIFF chunks, `fmt ` + `data`
- PPM (P6)            — image;  spec: netpbm binary portable pixmap
- BMP (24-bit BI_RGB) — image;  spec: BITMAPFILEHEADER + BITMAPINFOHEADER
- Y4M (YUV4MPEG2)     — video;  spec: text header + `FRAME` + raw 4:2:0
                         planes; fixed frame size makes timestamp seek
                         O(1) byte arithmetic — sampling k frames from an
                         hour of video decodes k frames, not 216,000.

Compressed formats (JPEG/PNG/MP4/MP3) genuinely need codec libraries
that are absent in this container; their decode paths raise
NotImplementedError with the format name (see multimodal.decode_media).
Encoders are included so tests and synthetic corpora can round-trip
deterministic payloads.

Reference parity: the reference (loukie7/Datacapsule) has no media
handling at all; this family exists for the training-data-pipeline
scope (multimodal columns over binary payloads).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# WAV — RIFF / PCM16
# --------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """float array in [-1, 1] (shape (n,) mono or (n, ch)) → RIFF/PCM16
    bytes."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    byte_rate = rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, byte_rate, ch * 2, 16)
    out = b"".join(
        [
            b"RIFF",
            struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)),
            b"WAVE",
            b"fmt ",
            struct.pack("<I", len(fmt)),
            fmt,
            b"data",
            struct.pack("<I", len(data)),
            data,
        ]
    )
    return out


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/PCM16 bytes → (rate, float32 array shape (n_frames, ch) in
    [-1, 1]). Walks the chunk list properly (skips LIST/INFO etc.);
    only uncompressed PCM (format tag 1) 16-bit is supported."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    rate = ch = bits = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
            if tag != 1:
                raise NotImplementedError(f"WAV format tag {tag} (only PCM=1)")
            if bits != 16:
                raise NotImplementedError(f"{bits}-bit WAV (only PCM16)")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    pcm = np.frombuffer(data, dtype="<i2")
    if ch > 1:
        pcm = pcm[: (len(pcm) // ch) * ch].reshape(-1, ch)
    else:
        pcm = pcm[:, None]
    return rate, (pcm.astype(np.float32) / 32768.0)


def audio_features(rate: int, x: np.ndarray) -> list[float]:
    """Real DSP features from decoded PCM: [duration_s, rms,
    zero_crossing_rate (crossings/sample), spectral_centroid_hz, peak].
    Multi-channel input is averaged to mono first."""
    mono = x.mean(axis=1) if x.ndim == 2 else x
    n = len(mono)
    if n == 0:
        return [0.0, 0.0, 0.0, 0.0, 0.0]
    rms = float(np.sqrt(np.mean(mono**2)))
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    mag = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    denom = float(mag.sum())
    centroid = float((freqs * mag).sum() / denom) if denom > 0 else 0.0
    return [n / rate, rms, zcr, centroid, float(np.max(np.abs(mono)))]


# --------------------------------------------------------------------------
# PPM — netpbm P6 (binary RGB)
# --------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 array (h, w, 3) → P6 bytes (maxval 255)."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = a.shape
    if c != 3:
        raise ValueError("PPM is RGB (h, w, 3)")
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def _ppm_token(payload: bytes, pos: int) -> tuple[bytes, int]:
    # skip whitespace and '#' comment lines between header tokens
    while pos < len(payload):
        c = payload[pos : pos + 1]
        if c == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            break
    start = pos
    while pos < len(payload) and not payload[pos : pos + 1].isspace():
        pos += 1
    return payload[start:pos], pos


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 bytes → uint8 array (h, w, 3). Handles header comments and
    maxval 255 (the binary-byte case)."""
    magic, pos = _ppm_token(payload, 0)
    if magic != b"P6":
        raise ValueError(f"not a P6 PPM (magic {magic!r})")
    wtok, pos = _ppm_token(payload, pos)
    htok, pos = _ppm_token(payload, pos)
    mtok, pos = _ppm_token(payload, pos)
    w, h, maxval = int(wtok), int(htok), int(mtok)
    if maxval != 255:
        raise NotImplementedError(f"PPM maxval {maxval} (only 255)")
    pos += 1  # single whitespace after maxval, then raster
    raster = payload[pos : pos + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("PPM raster truncated")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).copy()


# --------------------------------------------------------------------------
# BMP — 24-bit uncompressed BI_RGB
# --------------------------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 array (h, w, 3) RGB → 24-bit BI_RGB BMP bytes (bottom-up
    rows, BGR order, rows padded to 4 bytes — the on-disk layout)."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = a.shape
    if c != 3:
        raise ValueError("BMP encoder takes RGB (h, w, 3)")
    bgr = a[::-1, :, ::-1]  # bottom-up, BGR
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    padded = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    padded[:, :row_bytes] = bgr.reshape(h, row_bytes)
    raster = padded.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    off = 14 + len(info)
    head = struct.pack("<2sIHHI", b"BM", off + len(raster), 0, 0, off)
    return head + info + raster


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes → uint8 array (h, w, 3) RGB. Handles
    bottom-up and top-down (negative height) rasters and row padding."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (_sig, _size, _r1, _r2, off) = struct.unpack_from("<2sIHHI", payload, 0)
    (hdr_size, w, h, _planes, bpp, comp) = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp} (only 24-bit BI_RGB)")
    top_down = h < 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    raster = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
    rows = raster.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def image_features(img: np.ndarray) -> list[float]:
    """Real image statistics from a decoded (h, w, 3) frame:
    [width, height, mean_r, mean_g, mean_b, luma_std, edge_energy,
    luma_entropy_bits]. edge_energy = mean |finite difference| of the
    luminance plane; entropy over an 8-bin luma histogram."""
    h, w, _ = img.shape
    f = img.astype(np.float64)
    luma = 0.2126 * f[:, :, 0] + 0.7152 * f[:, :, 1] + 0.0722 * f[:, :, 2]
    gx = np.abs(np.diff(luma, axis=1)).mean() if w > 1 else 0.0
    gy = np.abs(np.diff(luma, axis=0)).mean() if h > 1 else 0.0
    hist, _ = np.histogram(luma, bins=8, range=(0.0, 256.0))
    p = hist / max(hist.sum(), 1)
    nz = p[p > 0]
    # + 0.0 normalizes IEEE -0.0 (single-bin histogram) to +0.0 so
    # cross-engine value-hashes agree
    entropy = float(-(nz * np.log2(nz)).sum()) + 0.0
    return [
        float(w),
        float(h),
        float(f[:, :, 0].mean()),
        float(f[:, :, 1].mean()),
        float(f[:, :, 2].mean()),
        float(luma.std()),
        float((gx + gy) / 2.0),
        entropy,
    ]


def resize_area(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Resize (h, w, 3) → (out_h, out_w, 3). Exact box/area average when
    both dimensions downscale by integer factors (the training-pipeline
    thumbnail case); nearest-neighbor index mapping otherwise. Pure
    numpy either way."""
    h, w, c = img.shape
    if out_w <= 0 or out_h <= 0:
        raise ValueError("resize target must be positive")
    if h % out_h == 0 and w % out_w == 0:
        fh, fw = h // out_h, w // out_w
        boxes = img.reshape(out_h, fh, out_w, fw, c).astype(np.float64)
        return np.round(boxes.mean(axis=(1, 3))).astype(np.uint8)
    yi = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xi = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[yi[:, None], xi[None, :]].copy()


# --------------------------------------------------------------------------
# Y4M — YUV4MPEG2 uncompressed video (4:2:0)
# --------------------------------------------------------------------------


def encode_y4m(frames_y: np.ndarray, fps: int) -> bytes:
    """uint8 array (n_frames, h, w) of luminance planes → YUV4MPEG2
    4:2:0 bytes (chroma planes written neutral 128). h and w must be
    even (4:2:0 subsampling)."""
    a = np.ascontiguousarray(frames_y, dtype=np.uint8)
    n, h, w = a.shape
    if h % 2 or w % 2:
        raise ValueError("Y4M 4:2:0 needs even dimensions")
    header = b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C420jpeg\n" % (w, h, fps)
    chroma = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    parts = [header]
    for i in range(n):
        parts.append(b"FRAME\n")
        parts.append(a[i].tobytes())
        parts.append(chroma)  # U
        parts.append(chroma)  # V
    return b"".join(parts)


def y4m_info(payload: bytes) -> dict:
    """Parse the Y4M stream header → {w, h, fps_num, fps_den, n_frames,
    header_len, frame_bytes}. Frame count and seek offsets follow from
    arithmetic alone — the point of the format for sampled decode."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    fps_num, fps_den = 30, 1
    for tok in payload[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = tok[1:].split(b":")
            fps_num, fps_den = int(num), int(den)
        elif tok[:1] == b"C" and tok not in (b"C420", b"C420jpeg", b"C420mpeg2", b"C420paldv"):
            raise NotImplementedError(f"Y4M chroma {tok!r} (only 4:2:0)")
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    plane = w * h
    frame_bytes = len(b"FRAME\n") + plane + plane // 2
    n_frames = (len(payload) - (nl + 1)) // frame_bytes
    return {
        "w": w,
        "h": h,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "n_frames": n_frames,
        "header_len": nl + 1,
        "frame_bytes": frame_bytes,
    }


def y4m_frame_at(payload: bytes, ts_ms: int, info: dict | None = None) -> np.ndarray | None:
    """Decode ONLY the luminance plane of the frame covering ts_ms —
    an O(1) seek (header_len + idx * frame_bytes), no sequential scan.
    Returns uint8 (h, w), or None past end-of-stream."""
    inf = info or y4m_info(payload)
    idx = (ts_ms * inf["fps_num"]) // (1000 * inf["fps_den"])
    return y4m_frame_index(payload, int(idx), inf)


def y4m_frame_index(payload: bytes, idx: int, info: dict | None = None) -> np.ndarray | None:
    """O(1) seek by frame INDEX (ms→index rounding belongs to the
    caller; index access avoids a double conversion losing a frame)."""
    inf = info or y4m_info(payload)
    if idx < 0 or idx >= inf["n_frames"]:
        return None
    start = inf["header_len"] + idx * inf["frame_bytes"]
    if payload[start : start + 6] != b"FRAME\n":
        raise ValueError(f"Y4M frame marker missing at index {idx}")
    y0 = start + 6
    plane = inf["w"] * inf["h"]
    return (
        np.frombuffer(payload, dtype=np.uint8, count=plane, offset=y0)
        .reshape(inf["h"], inf["w"])
        .copy()
    )
