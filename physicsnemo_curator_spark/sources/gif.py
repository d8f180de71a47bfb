"""Pure-Python GIF codec (87a/89a).

Follows the public GIF89a specification: logical screen descriptor,
global/local color tables, image descriptors with interlacing, the
sub-block wire format, Graphic Control / application / comment
extensions, and GIF-flavor LZW (LSB-first bit packing, variable
initial code size, no early change — the TIFF flavor in
``sources/tiff.py`` is MSB-first WITH early change; the two differ
on exactly those two axes).

Decode composites animations frame by frame (disposal methods
none/keep (0,1), restore-background (2), restore-previous (3),
transparency honored) and returns full-canvas RGB or grayscale
frames.  Encode writes exact-palette GIFs: grayscale input gets the
identity 256-gray palette (lossless), RGB input with ≤256 distinct
colors gets an exact palette; richer content raises
``NotImplementedError`` (palette quantization is out of the honest
subset — GIF would be lossy there anyway).

Scale shape: decoded task-side inside ``mapInPandas`` batches — one
task per payload, like every codec in this package.
"""

from __future__ import annotations

import struct

import numpy as np


def is_gif(data: bytes) -> bool:
    return len(data) >= 6 and data[:6] in (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# GIF LZW (LSB-first, no early change)


def _gif_lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    bits = min_code_size + 1
    next_code = eoi + 1
    acc = 0
    acc_bits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << acc_bits
        acc_bits += 8
        while acc_bits >= bits:
            code = acc & ((1 << bits) - 1)
            acc >>= bits
            acc_bits -= bits
            if code == clear:
                table = fresh()
                bits = min_code_size + 1
                next_code = eoi + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("corrupt GIF LZW stream")
                entry = table[code]
            elif code < next_code:
                entry = table[code]
                table.append(prev + entry[:1])
                next_code += 1
            elif code == next_code:
                entry = prev + prev[:1]
                table.append(entry)
                next_code += 1
            else:
                raise ValueError("corrupt GIF LZW stream")
            # no early change: the writer widens after the code whose
            # table has grown past the mask; the reader's table lags
            # by one entry, so its bump fires at the mask boundary
            if next_code >= (1 << bits) and bits < 12:
                bits += 1
            out += entry
            prev = entry
    return bytes(out)


def _gif_lzw_encode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    acc_bits = 0

    def emit(code: int, width: int):
        nonlocal acc, acc_bits
        acc |= code << acc_bits
        acc_bits += width
        while acc_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    bits = min_code_size + 1
    next_code = eoi + 1
    emit(clear, bits)
    w = b""
    for byte in data:
        c = bytes([byte])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], bits)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << bits) + 1 and bits < 12:
            bits += 1
        if next_code == 4096:
            emit(clear, bits)
            table = {bytes([i]): i for i in range(clear)}
            bits = min_code_size + 1
            next_code = eoi + 1
        w = c
    if w:
        emit(table[w], bits)
        # the decoder ADDS a table entry for this final code (the
        # encoder does not), so its width bump can fire before the
        # EOI — mirror it or the EOI is read one bit wide
        if next_code >= (1 << bits) and bits < 12:
            bits += 1
    emit(eoi, bits)
    if acc_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        pos += n


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(idx)
    out[order] = idx
    return out


def _interlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return idx[order]


# ---------------------------------------------------------------------------
# encode


def encode_gif(
    frames: list[np.ndarray] | np.ndarray,
    *,
    delay_cs: int = 10,
    loop: bool = True,
    interlace: bool = False,
) -> bytes:
    """Encode one image or an animation (list of same-shape uint8
    frames).  Grayscale ``(h, w)`` uses the identity gray palette;
    RGB ``(h, w, 3)`` must use ≤256 distinct colors (exact palette).
    Animations get a Graphic Control Extension per frame
    (``delay_cs`` hundredths of a second) and a NETSCAPE loop block.
    Every path is lossless."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("cannot encode an empty frame list")
    h, w = frames[0].shape[:2]
    for f in frames:
        # full-shape check: a stray RGB frame in a gray list would
        # otherwise be byte-reinterpreted as indices (silent garbage)
        if f.shape != frames[0].shape or f.dtype != np.uint8:
            raise ValueError(
                "all frames must be uint8 with identical shape "
                "(no gray/RGB mixing)"
            )
    gray = frames[0].ndim == 2
    if gray:
        palette = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
        index_frames = [f for f in frames]
    else:
        colors, inverse = np.unique(
            np.concatenate([f.reshape(-1, 3) for f in frames], axis=0),
            axis=0,
            return_inverse=True,
        )
        if len(colors) > 256:
            raise NotImplementedError(
                f"GIF encode with {len(colors)} distinct colors needs "
                "palette quantization (lossy) — out of the honest subset"
            )
        palette = colors
        index_frames = [
            frame_idx.astype(np.uint8).reshape(h, w)
            for frame_idx in np.split(
                inverse.reshape(-1), len(frames)
            )
        ]
    # color table size: power of two ≥ palette length, minimum 2
    ct_bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    ct_len = 1 << ct_bits
    table = np.zeros((ct_len, 3), dtype=np.uint8)
    table[: len(palette)] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((ct_bits - 1) & 7) | (((ct_bits - 1) & 7) << 4)])
    out += b"\x00\x00"  # background index, aspect
    out += table.tobytes()
    if len(frames) > 1 and loop:
        out += b"\x21\xff\x0bNETSCAPE2.0" + bytes([3, 1, 0, 0, 0])
    mcs = max(2, ct_bits)
    for fi, idx in enumerate(index_frames):
        if len(frames) > 1:
            out += b"\x21\xf9" + bytes([4, 0]) + struct.pack(
                "<H", delay_cs
            ) + bytes([0, 0])
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([(0x40 if interlace else 0) | ((ct_bits - 1) & 7) * 0])
        rows = _interlace(idx) if interlace else idx
        out += bytes([mcs])
        out += _sub_blocks(_gif_lzw_encode(rows.tobytes(), mcs))
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# decode


def parse_gif(data: bytes) -> dict:
    """Walk the container without LZW-decoding pixels: returns
    ``{"meta": {...}, "frames": [frame_dict, ...]}`` where each frame
    records its descriptor, palette, compressed span and graphic
    control."""
    if not is_gif(data):
        raise ValueError("not a GIF payload")
    w, h = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    pos = 13
    global_ct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        global_ct = np.frombuffer(
            data[pos : pos + 3 * n], dtype=np.uint8
        ).reshape(n, 3)
        pos += 3 * n
    frames = []
    gce = None
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:
                blk, pos = _read_sub_blocks(data, pos)
                flags = blk[0]
                delay = struct.unpack_from("<H", blk, 1)[0]
                gce = {
                    "disposal": (flags >> 2) & 7,
                    "transparent": blk[3] if flags & 1 else None,
                    "delay_cs": delay,
                }
            else:
                _blk, pos = _read_sub_blocks(data, pos)
            continue
        if b == 0x2C:  # image descriptor
            left, top, fw, fh = struct.unpack_from("<HHHH", data, pos + 1)
            fpacked = data[pos + 9]
            pos += 10
            local_ct = None
            if fpacked & 0x80:
                n = 2 << (fpacked & 7)
                local_ct = np.frombuffer(
                    data[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            mcs = data[pos]
            pos += 1
            start = pos
            blob, pos = _read_sub_blocks(data, pos)
            frames.append(
                {
                    "left": left,
                    "top": top,
                    "width": fw,
                    "height": fh,
                    "interlace": bool(fpacked & 0x40),
                    "palette": local_ct if local_ct is not None else global_ct,
                    "min_code_size": mcs,
                    "blob": blob,
                    "span": (start, pos - start),
                    "gce": gce,
                }
            )
            gce = None
            continue
        raise ValueError(f"unknown GIF block 0x{b:02x}")
    meta = {
        "width": int(w),
        "height": int(h),
        "n_frames": len(frames),
        "codec": "gif",
        "fps": 0,
    }
    if frames and frames[0]["gce"] and frames[0]["gce"]["delay_cs"]:
        meta["fps"] = round(100 / frames[0]["gce"]["delay_cs"])
    return {"meta": meta, "frames": frames}


def _frame_indices(fr: dict) -> np.ndarray:
    raw = _gif_lzw_decode(fr["blob"], fr["min_code_size"])
    n = fr["width"] * fr["height"]
    if len(raw) < n:
        raise ValueError("GIF frame shorter than its geometry")
    idx = np.frombuffer(raw[:n], dtype=np.uint8).reshape(
        fr["height"], fr["width"]
    )
    if fr["interlace"]:
        idx = _deinterlace(idx)
    return idx


def _all_gray(parsed: dict) -> bool:
    """True when every frame's palette is the identity gray ramp — a
    palette scan only, no pixel decode."""
    ramp = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    for fr in parsed["frames"]:
        pal = fr["palette"]
        if pal is None:
            raise ValueError("GIF frame without a color table")
        if len(pal) != 256 or not np.array_equal(pal, ramp):
            return False
    return True


def _composite(parsed: dict, upto: int | None = None) -> list[np.ndarray]:
    """Composite frames 0..upto (inclusive; None = all) onto the
    logical screen with disposal/transparency semantics."""
    meta = parsed["meta"]
    w, h = meta["width"], meta["height"]
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    frames_out: list[np.ndarray] = []
    prev_canvas = None
    todo = parsed["frames"]
    if upto is not None:
        todo = todo[: upto + 1]
    for fr in todo:
        pal = fr["palette"]
        if pal is None:
            raise ValueError("GIF frame without a color table")
        idx = _frame_indices(fr)
        gce = fr["gce"] or {}
        disposal = gce.get("disposal", 0)
        transparent = gce.get("transparent")
        if disposal == 3:
            prev_canvas = canvas.copy()
        rgb = pal[np.minimum(idx, len(pal) - 1)]
        y0, x0 = fr["top"], fr["left"]
        y1, x1 = y0 + fr["height"], x0 + fr["width"]
        region = canvas[y0:y1, x0:x1]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames_out.append(canvas.copy())
        if disposal == 2:
            canvas[y0:y1, x0:x1] = 0
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas.copy()
    return frames_out


def decode_gif(data: bytes) -> tuple[list[np.ndarray], dict]:
    """Decode every frame, compositing sub-rectangle frames onto the
    logical screen with disposal/transparency semantics.  Returns
    grayscale ``(h, w)`` frames when every palette used is the
    identity gray ramp, RGB otherwise."""
    parsed = parse_gif(data)
    meta = dict(parsed["meta"])
    frames_out = _composite(parsed)
    if _all_gray(parsed):
        frames_out = [f[:, :, 0].copy() for f in frames_out]
    meta["n_frames"] = len(frames_out)
    return frames_out, meta


def decode_gif_frame(data: bytes, parsed: dict, index: int) -> np.ndarray:
    """Decode ONE frame of an already-parsed container.  GIF frames
    can depend on earlier frames (disposal compositing), so this
    decodes the prefix up to ``index`` — later frames are never
    touched, but unlike the AVI/MP4/MKV containers, sparse sampling
    still pays for the prefix.  Gray/RGB shape matches
    :func:`decode_gif` (decided by ALL palettes, a metadata scan)."""
    frame = _composite(parsed, upto=index)[index]
    if _all_gray(parsed):
        return frame[:, :, 0].copy()
    return frame


def iter_gif_frames(data: bytes, *, every_n: int = 1):
    """Yield ``(frame_index, frame)`` for every ``every_n``-th frame.
    The composite runs ONCE over all frames (GIF's inter-frame
    dependence makes skipping decode impossible), but skipped frames
    are never copied out."""
    parsed = parse_gif(data)
    frames = _composite(parsed)
    if _all_gray(parsed):
        frames = [f[:, :, 0].copy() for f in frames]
    for i in range(0, len(frames), every_n):
        yield i, frames[i]
