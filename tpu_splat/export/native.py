"""Bindings to the native C++ SPZ codec (native/spz).

Provides the `splat_converter` CLI (mirrors the reference tool invoked at
main.py:1532-1548) and the `libspz_converter.so` C ABI (`ConvertSpzToPly`,
plus our `ConvertPlyToSpz` extension) via ctypes. Builds on demand with cmake.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

_REPO_ROOT = Path(__file__).resolve().parents[2]
_NATIVE_DIR = _REPO_ROOT / "native" / "spz"
_BUILD_DIR = _NATIVE_DIR / "build"


def build_native(force: bool = False) -> Path:
    """Build the native codec if needed; returns the build directory."""
    exe = _BUILD_DIR / "splat_converter"
    lib = _BUILD_DIR / "libspz_converter.so"
    if exe.exists() and lib.exists() and not force:
        return _BUILD_DIR
    subprocess.run(
        ["cmake", "-S", str(_NATIVE_DIR), "-B", str(_BUILD_DIR), "-DCMAKE_BUILD_TYPE=Release"],
        check=True,
        capture_output=True,
    )
    subprocess.run(
        ["cmake", "--build", str(_BUILD_DIR)], check=True, capture_output=True
    )
    return _BUILD_DIR


def splat_converter_path() -> Path:
    return build_native() / "splat_converter"


def run_splat_converter(input_path: str) -> Path:
    """Convert .ply<->.spz with the native CLI; returns the output path."""
    inp = Path(input_path)
    out = inp.with_suffix(".spz" if inp.suffix == ".ply" else ".ply")
    subprocess.run([str(splat_converter_path()), str(inp)], check=True, capture_output=True)
    return out


_lib: Optional[ctypes.CDLL] = None


def _load_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib_path = build_native() / "libspz_converter.so"
        _lib = ctypes.CDLL(str(lib_path))
        _lib.ConvertSpzToPly.restype = ctypes.c_bool
        _lib.ConvertSpzToPly.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        _lib.ConvertPlyToSpz.restype = ctypes.c_bool
        _lib.ConvertPlyToSpz.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    return _lib


def convert_spz_to_ply(spz_path: str, ply_path: str) -> bool:
    return bool(_load_lib().ConvertSpzToPly(str(spz_path).encode(), str(ply_path).encode()))


def convert_ply_to_spz(ply_path: str, spz_path: str) -> bool:
    return bool(_load_lib().ConvertPlyToSpz(str(ply_path).encode(), str(spz_path).encode()))
