"""ctypes binding for the native IO core (daclip_tpu/native/dio.cc).

Provides JPEG/PNG decode with crop-at-decode (libjpeg's crop_scanline +
skip_scanlines — only the cropped window's rows/columns go through the IDCT)
and a GIL-free batched decoder over a pthread pool, emitting cv2-compatible
BGR uint8.  Replaces the reference's full-decode-then-crop worker pattern
(universal-image-restoration/data/util.py:68-85 + LQGT_dataset.py random
crop) on the folder data path.

The shared library is compiled on demand with g++ (cached beside the source;
rebuilt when dio.cc changes) and everything degrades gracefully to the cv2
path when a toolchain or libjpeg/libpng headers are missing —
`available()` gates all call sites.  Disable explicitly with
DACLIP_TPU_NATIVE_IO=0.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "native", "dio.cc")
_lock = threading.Lock()
_lib = None
_tried = False


def _build(src: str) -> Optional[str]:
    tag = hashlib.sha256(open(src, "rb").read()).hexdigest()[:16]
    cache = os.environ.get("DACLIP_TPU_NATIVE_CACHE",
                           os.path.join(os.path.dirname(src), "build"))
    out = os.path.join(cache, f"libdaclip_io_{tag}.so")
    if os.path.exists(out):
        return out
    os.makedirs(cache, exist_ok=True)
    tmp = out + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-o", tmp, src,
           "-ljpeg", "-lpng", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    os.replace(tmp, out)  # atomic publish
    return out


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("DACLIP_TPU_NATIVE_IO", "1") == "0":
            return None
        path = _build(_SRC)
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.dio_probe.restype = ctypes.c_int
        lib.dio_probe.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
        lib.dio_decode_crop.restype = ctypes.c_int
        lib.dio_decode_crop.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                        ctypes.c_int, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_int,
                                        ctypes.c_void_p]
        lib.dio_batch_decode_crop.restype = None
        lib.dio_batch_decode_crop.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def probe(data: bytes):
    """(w, h, c) of an encoded JPEG/PNG, header-only (no pixel decode)."""
    lib = _load()
    assert lib is not None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.dio_probe(data, len(data), ctypes.byref(w), ctypes.byref(h),
                       ctypes.byref(c))
    if rc != 0:
        raise ValueError(f"dio_probe failed rc={rc}")
    return w.value, h.value, c.value


# JPEG fancy chroma upsampling reads context outside the decode window, so a
# bare cropped decode differs from full-decode-then-crop in edge pixels
# (measured up to 32/255).  Expanding the window by one iMCU (8 px) per side
# and trimming restores bit-exactness (verified vs cv2 full decode).
_JPEG_CTX = 8


def _expand(crop, W, H):
    x0, y0, cw, ch = crop
    xm, ym = max(0, x0 - _JPEG_CTX), max(0, y0 - _JPEG_CTX)
    x1, y1 = min(W, x0 + cw + _JPEG_CTX), min(H, y0 + ch + _JPEG_CTX)
    return (xm, ym, x1 - xm, y1 - ym), (x0 - xm, y0 - ym)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_needs_cv2(data: bytes) -> bool:
    """True for PNGs the native path would silently ALTER vs cv2: 16-bit
    (cv2 keeps uint16, libpng's simplified API downconverts to 8-bit) and
    alpha-bearing color types (libpng composites; cv2's IMREAD_UNCHANGED
    path truncates raw channels), plus palette PNGs carrying a tRNS
    transparency chunk (libpng composites the transparency, cv2 returns raw
    BGRA).  IHDR layout: sig(8) len(4) 'IHDR'(4) w(4) h(4) bitdepth(1)
    colortype(1)."""
    if not data.startswith(_PNG_SIG) or len(data) < 26:
        return False
    bit_depth, color_type = data[24], data[25]
    if bit_depth != 8 or color_type in (4, 6):
        return True
    if color_type == 3:
        # walk the (pre-IDAT) chunk headers for tRNS; a substring search
        # could false-positive inside compressed IDAT payloads
        pos = 8
        while pos + 8 <= len(data):
            length = int.from_bytes(data[pos:pos + 4], "big")
            ctype = data[pos + 4:pos + 8]
            if ctype == b"tRNS":
                return True
            if ctype == b"IDAT" or ctype == b"IEND":
                break
            pos += 12 + length  # len + type + payload + crc
    return False


def decode(data: bytes, crop=None) -> np.ndarray:
    """Decode JPEG/PNG bytes → HWC BGR (or HW1 gray) uint8.  `crop` is an
    optional (x0, y0, w, h) window decoded via crop-at-decode (JPEG decodes
    only the needed rows/iMCU columns + an 8 px context margin); output is
    bit-identical to full-decode-then-crop.

    Raises ValueError for PNGs whose cv2 decode would differ (16-bit /
    alpha) so callers fall back to the cv2 path instead of silently
    producing different pixels per host environment."""
    lib = _load()
    assert lib is not None
    if _png_needs_cv2(data):
        raise ValueError("16-bit/alpha/palette-tRNS PNG: native decode would "
                         "differ from cv2; use the cv2 path")
    W, H, _ = probe(data)
    trim = None
    if crop is None:
        x0 = y0 = 0
        cw, ch = W, H
    else:
        want = crop
        (x0, y0, cw, ch), off = _expand(crop, W, H)
        trim = (off[1], off[1] + want[3], off[0], off[0] + want[2])
    out = np.empty((ch, cw, 3), np.uint8)  # worst case; shrunk for gray
    rc = lib.dio_decode_crop(data, len(data), x0, y0, cw, ch,
                             out.ctypes.data_as(ctypes.c_void_p))
    if rc < 0:
        raise ValueError(f"dio_decode_crop failed rc={rc}")
    if rc == 1:
        out = out.reshape(-1)[:ch * cw].reshape(ch, cw, 1).copy()
    if trim is not None:
        out = np.ascontiguousarray(out[trim[0]:trim[1], trim[2]:trim[3]])
    return out


def decode_file(path: str, crop=None) -> np.ndarray:
    with open(path, "rb") as f:
        return decode(f.read(), crop=crop)


def decode_batch(datas: Sequence[bytes], crops=None,
                 threads: Optional[int] = None):
    """Decode many images concurrently on the pthread pool (no GIL).  `crops`
    is an optional list of (x0, y0, w, h); threads defaults to cpu count."""
    lib = _load()
    assert lib is not None
    n = len(datas)
    if any(_png_needs_cv2(d) for d in datas):
        raise ValueError("16-bit or alpha PNG in batch: native decode would "
                         "differ from cv2; use the cv2 path")
    if crops is None:
        crops = [None] * n
    params = np.empty((n, 4), np.int32)
    outs = []
    keep = []  # keep bytes objects alive
    bufs = (ctypes.c_char_p * n)()
    lens = (ctypes.c_size_t * n)()
    optr = (ctypes.c_void_p * n)()
    rcs = (ctypes.c_int * n)()
    trims = []
    for i, data in enumerate(datas):
        W, H, _ = probe(data)
        if crops[i] is None:
            params[i] = (0, 0, W, H)
            trims.append(None)
        else:
            want = crops[i]
            (x0, y0, cw, ch), off = _expand(want, W, H)
            params[i] = (x0, y0, cw, ch)
            trims.append((off[1], off[1] + want[3], off[0], off[0] + want[2]))
        out = np.empty((params[i, 3], params[i, 2], 3), np.uint8)
        outs.append(out)
        keep.append(data)
        bufs[i] = data
        lens[i] = len(data)
        optr[i] = out.ctypes.data_as(ctypes.c_void_p).value
    if threads is None:
        threads = os.cpu_count() or 1
    lib.dio_batch_decode_crop(
        n, bufs, lens,
        params.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), optr, rcs,
        threads)
    res = []
    for i, out in enumerate(outs):
        rc = rcs[i]
        if rc < 0:
            raise ValueError(f"dio batch item {i} failed rc={rc}")
        if rc == 1:
            ch, cw = out.shape[:2]
            out = out.reshape(-1)[:ch * cw].reshape(ch, cw, 1).copy()
        t = trims[i]
        if t is not None:
            out = np.ascontiguousarray(out[t[0]:t[1], t[2]:t[3]])
        res.append(out)
    return res
