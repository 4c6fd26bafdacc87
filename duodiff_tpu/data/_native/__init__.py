"""Native (C++) batch-assembly core, built on demand with g++ and bound via
ctypes. Falls back to numpy transparently when no compiler is available —
``get_assembler()`` returns None in that case."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "batch_assembler.cpp"
_LIB = None
_TRIED = False


def _build_library() -> Optional[Path]:
    src = _SRC.read_text()
    tag = hashlib.sha256(src.encode()).hexdigest()[:16]
    cache_dir = Path(
        os.environ.get("DUODIFF_NATIVE_CACHE",
                       Path.home() / ".cache" / "duodiff_native")
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    out = cache_dir / f"batch_assembler_{tag}.so"
    if out.exists():
        return out
    tmp = out.with_suffix(".so.tmp")
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", str(_SRC), "-o", str(tmp),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError):
        return None
    os.replace(tmp, out)
    return out


def get_assembler():
    """Returns assemble(images_u8: list[np.uint8 HWC], scale, offset,
    out: np.float32 (N, H, W, C)) or None when native build is unavailable."""
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        path = _build_library()
        if path is not None:
            lib = ctypes.CDLL(str(path))
            lib.assemble_batch.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_float, ctypes.c_float,
                ctypes.c_void_p, ctypes.c_int,
            ]
            lib.assemble_batch.restype = None
            _LIB = lib
    if _LIB is None:
        return None

    lib = _LIB

    def assemble(images, scale: float, offset: float, out: np.ndarray,
                 n_threads: int = 4):
        n = len(images)
        hwc = int(np.prod(out.shape[1:]))
        ptrs = (ctypes.c_void_p * n)(
            *[img.ctypes.data_as(ctypes.c_void_p).value for img in images]
        )
        lib.assemble_batch(
            ptrs, n, hwc, ctypes.c_float(scale), ctypes.c_float(offset),
            out.ctypes.data_as(ctypes.c_void_p), n_threads,
        )

    return assemble
