"""TGA (Truevision Targa) codec — the uncompressed/RLE texture
format game-asset and legacy-imaging corpora carry.

Public layout: an 18-byte little-endian header (id length, colormap
type, image type, colormap spec, origin, geometry, pixel depth,
descriptor whose bit 5 selects top-down row order), an optional
image-id blob, then pixel data — BGR(A) byte order, optionally RLE-
packed (high packet bit = run of the following pixel, low 7 bits =
count-1).  Decode handles types 2/3 (truecolor/gray) and their RLE
twins 10/11 at 8/24/32-bit depth with both row origins; colormapped
forms (1/9) raise loudly.  The writer emits top-down type 3 for
gray, type 2 for RGB/RGBA (``rle=True`` switches to 11/10)."""

from __future__ import annotations

import struct

import numpy as np


def is_tga(data: bytes) -> bool:
    """TGA has no magic; sniff the header's internal consistency the
    way file(1) does (colormap type 0/1, a known image type, a sane
    depth).  Prefer dispatching this AFTER magic-bearing formats."""
    if len(data) < 18:
        return False
    cmap_type, img_type = data[1], data[2]
    depth = data[16]
    return (
        cmap_type in (0, 1)
        and img_type in (1, 2, 3, 9, 10, 11)
        and depth in (8, 15, 16, 24, 32)
        and struct.unpack_from("<HH", data, 12) != (0, 0)
    )


def encode_tga(pixels: np.ndarray, *, rle: bool = False) -> bytes:
    """Encode uint8 gray/RGB/RGBA, top-down rows."""
    px = np.asarray(pixels)
    if px.dtype != np.uint8:
        raise ValueError("TGA encodes uint8 samples only")
    if px.ndim == 2:
        channels, img_type = 1, 3
        body_px = px[:, :, None]
    elif px.ndim == 3 and px.shape[2] in (3, 4):
        channels = px.shape[2]
        img_type = 2
        body_px = px[:, :, [2, 1, 0] + ([3] if channels == 4 else [])]
    else:
        raise ValueError("expected (H,W), (H,W,3) or (H,W,4)")
    h, w = px.shape[:2]
    if rle:
        img_type += 8
    header = struct.pack(
        "<BBBHHBHHHHBB",  # colormap spec is 5 bytes: first/len/size
        0, 0, img_type, 0, 0, 0, 0, 0, w, h, channels * 8, 0x20,
    )
    flat = body_px.reshape(-1, channels)
    if not rle:
        return header + flat.tobytes()
    out = bytearray(header)
    n = len(flat)
    i = 0
    while i < n:
        # find the run length of identical pixels at i (capped 128)
        j = i + 1
        while j < n and j - i < 128 and (flat[j] == flat[i]).all():
            j += 1
        if j - i >= 2:
            out.append(0x80 | (j - i - 1))
            out += flat[i].tobytes()
            i = j
        else:
            # raw packet: literals until the next run of >= 2
            k = i + 1
            while (
                k < n
                and k - i < 128
                and not (k + 1 < n and (flat[k + 1] == flat[k]).all())
            ):
                k += 1
            out.append(k - i - 1)
            out += flat[i:k].tobytes()
            i = k
    return bytes(out)


def decode_tga(data: bytes) -> tuple[np.ndarray, dict]:
    data = bytes(data)
    if not is_tga(data):
        raise ValueError("not a TGA payload")
    id_len, cmap_type, img_type = data[0], data[1], data[2]
    if cmap_type or img_type in (1, 9):
        raise NotImplementedError(
            "colormapped TGA is outside the written subset"
        )
    w, h = struct.unpack_from("<HH", data, 12)
    depth, desc = data[16], data[17]
    if depth not in (8, 24, 32):
        raise NotImplementedError(f"TGA depth {depth} not supported")
    channels = depth // 8
    top_down = bool(desc & 0x20)
    at = 18 + id_len
    n = w * h
    if img_type in (2, 3):
        body = data[at : at + n * channels]
        if len(body) < n * channels:
            raise ValueError("truncated TGA body")
        flat = np.frombuffer(body, dtype=np.uint8).reshape(n, channels)
    elif img_type in (10, 11):
        flat = np.empty((n, channels), dtype=np.uint8)
        i = 0
        while i < n:
            if at >= len(data):
                raise ValueError("truncated TGA RLE stream")
            head = data[at]
            at += 1
            count = (head & 0x7F) + 1
            if head & 0x80:
                flat[i : i + count] = np.frombuffer(
                    data[at : at + channels], dtype=np.uint8
                )
                at += channels
            else:
                raw = data[at : at + count * channels]
                if len(raw) < count * channels:
                    raise ValueError("truncated TGA raw packet")
                flat[i : i + count] = np.frombuffer(
                    raw, dtype=np.uint8
                ).reshape(count, channels)
                at += count * channels
            i += count
    else:
        raise NotImplementedError(f"TGA image type {img_type}")
    px = flat.reshape(h, w, channels)
    if not top_down:
        px = px[::-1]
    if channels == 1:
        px = px[:, :, 0]
    else:
        order = [2, 1, 0] + ([3] if channels == 4 else [])
        px = px[:, :, order]
    meta = {
        "width": int(w), "height": int(h), "channels": channels,
        "bits": int(depth), "codec": "tga",
        "rle": img_type in (10, 11),
    }
    return px.copy(), meta


def probe_tga(data: bytes) -> dict:
    w, h = struct.unpack_from("<HH", data, 12)
    depth = data[16]
    return {
        "format": "tga", "kind": "image", "width": int(w),
        "height": int(h), "bits": int(depth),
        "channels": max(1, depth // 8),
    }
