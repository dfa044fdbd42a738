"""Real image codecs for the multimodal seam.

Two implementations of the ``MediaCodec``/resize contract
(``knightshift_spark.seams``):

- ``NumpyImageCodec`` — zero-dependency (numpy only) decoder for two REAL
  uncompressed image formats: binary PPM (P6) and 24-bit BI_RGB BMP.
  Real pixels in, real bilinear resampling, PPM bytes out. This is the
  always-available real-codec path: the formats are simple enough to
  decode exactly with stdlib + numpy, so CI exercises true
  decode→resize→re-encode semantics, not a shape-only fake.
- ``PillowImageCodec`` — optional, auto-detected: when Pillow is
  installed it decodes every PIL-supported format (JPEG/PNG/...). Not in
  this container; the class import-gates and tests skip-mark on absence.

Compressed formats without Pillow raise ``MediaCodecUnavailable`` naming
the sniffed format — the honest gate, now scoped to exactly the formats
that genuinely need an external library.

Feature extraction: grayscale column-strip mean pooling to ``dim``
floats in [0, 1] — deterministic, resolution-robust, and identical
across both codecs for the same decoded pixels.
"""

from __future__ import annotations

import re
import struct
from dataclasses import dataclass

import numpy as np


def sniff_format(payload: bytes | None) -> str | None:
    """Best-effort magic-number sniff: 'ppm' | 'bmp' | 'png' | 'jpeg' |
    'gif' | None (unknown/empty)."""
    if not payload:
        return None
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:4] in (b"GIF8",):
        return "gif"
    return None


# -- PPM (P6) ---------------------------------------------------------------

_PPM_HEADER = re.compile(
    rb"^P6\s+(?:#[^\n]*\n\s*)*(\d+)\s+(?:#[^\n]*\n\s*)*(\d+)\s+(?:#[^\n]*\n\s*)*(\d+)\s"
)


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval ≤ 255) → (H, W, 3) uint8 array."""
    m = _PPM_HEADER.match(payload)
    if not m:
        raise ValueError("not a binary P6 PPM")
    w, h, maxval = (int(g) for g in m.groups())
    if maxval > 255:
        raise ValueError(f"16-bit PPM unsupported (maxval={maxval})")
    data = payload[m.end() : m.end() + w * h * 3]
    if len(data) < w * h * 3:
        raise ValueError("truncated PPM payload")
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 array → binary PPM (P6) bytes."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


# -- BMP (24-bit BI_RGB) ----------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP → (H, W, 3) uint8 RGB array.

    Handles the standard layout: BGR pixel order, rows padded to 4 bytes,
    bottom-up (positive height) or top-down (negative height).
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})")
    top_down = h_raw < 0
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR → RGB
    return rgb if top_down else rgb[::-1]


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit BI_RGB BMP bytes (bottom-up)."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # flip + RGB→BGR
    raw = body.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(raw), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raw), 2835, 2835, 0, 0)
    return header + raw


# -- resampling + features --------------------------------------------------


def resize_bilinear(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Bilinear resample of an (H, W, C) uint8 array to (height, width, C)."""
    h, w = img.shape[:2]
    if (h, w) == (height, width):
        return img.copy()
    x = np.linspace(0, w - 1, width)
    y = np.linspace(0, h - 1, height)
    x0 = np.floor(x).astype(np.intp)
    y0 = np.floor(y).astype(np.intp)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    wx = (x - x0)[None, :, None]
    wy = (y - y0)[:, None, None]
    f = img.astype(np.float64)
    out = (
        f[y0][:, x0] * (1 - wx) * (1 - wy)
        + f[y0][:, x1] * wx * (1 - wy)
        + f[y1][:, x0] * (1 - wx) * wy
        + f[y1][:, x1] * wx * wy
    )
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def strip_features(img: np.ndarray, dim: int) -> list[float]:
    """Grayscale vertical-strip means → ``dim`` floats in [0, 1]."""
    gray = img.astype(np.float64).mean(axis=2)  # (H, W)
    strips = np.array_split(gray, dim, axis=1)
    return [float(s.mean() / 255.0) if s.size else 0.0 for s in strips]


# -- codecs -----------------------------------------------------------------


@dataclass(frozen=True)
class NumpyImageCodec:
    """Real decode/resize/features for PPM + BMP, numpy only.

    ``resize`` re-encodes in the SOURCE container (PPM in → PPM out,
    BMP in → BMP out) so a pipeline's format survives the stage.
    """

    dim: int = 8

    def decode(self, payload: bytes) -> np.ndarray:
        fmt = sniff_format(payload)
        if fmt == "ppm":
            return decode_ppm(payload)
        if fmt == "bmp":
            return decode_bmp(payload)
        from knightshift_spark.operators.multimodal import MediaCodecUnavailable

        raise MediaCodecUnavailable(
            f"format {fmt or 'unknown'} needs Pillow (not installed); "
            "NumpyImageCodec decodes ppm/bmp"
        )

    def resize(self, payload: bytes | None, width: int, height: int) -> bytes | None:
        if payload is None:
            return None
        img = resize_bilinear(self.decode(payload), width, height)
        return encode_bmp(img) if sniff_format(payload) == "bmp" else encode_ppm(img)

    def features(self, payload: bytes | None) -> list[float]:
        if payload is None:
            return [0.0] * self.dim
        return strip_features(self.decode(payload), self.dim)


def pillow_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


@dataclass(frozen=True)
class PillowImageCodec:
    """Pillow-backed codec: every PIL format (JPEG/PNG/...). Optional —
    constructing it without Pillow raises ``MediaCodecUnavailable`` so
    configs can name it and fail with the dependency spelled out."""

    dim: int = 8
    out_format: str = "PNG"

    def __post_init__(self):
        if not pillow_available():
            from knightshift_spark.operators.multimodal import MediaCodecUnavailable

            raise MediaCodecUnavailable("PillowImageCodec requires Pillow (pip install pillow)")

    def decode(self, payload: bytes) -> np.ndarray:
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))

    def resize(self, payload: bytes | None, width: int, height: int) -> bytes | None:
        import io

        from PIL import Image

        if payload is None:
            return None
        img = Image.open(io.BytesIO(payload)).convert("RGB").resize(
            (width, height), Image.BILINEAR
        )
        buf = io.BytesIO()
        img.save(buf, format=self.out_format)
        return buf.getvalue()

    def features(self, payload: bytes | None) -> list[float]:
        if payload is None:
            return [0.0] * self.dim
        return strip_features(self.decode(payload), self.dim)


def best_image_codec(dim: int = 8):
    """Pillow when installed, else the numpy PPM/BMP codec — the
    production default for the decode/resize/features seams."""
    return PillowImageCodec(dim) if pillow_available() else NumpyImageCodec(dim)
