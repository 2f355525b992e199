"""ctypes bindings for the C++ native runtime (aware_tpu/_native).

Builds the shared library on first use if a compiler is available; every
entry point has a documented pure-Python fallback, so the package works
without a toolchain (the native path is the production ingest fast path).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Sequence

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).parent / "_native"
_LIB_PATH = _NATIVE_DIR / "libaware_native.so"
_lib: ctypes.CDLL | None = None


class _WavInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_int32),
        ("channels", ctypes.c_int32),
        ("frames", ctypes.c_int64),
    ]


def build_native(force: bool = False) -> bool:
    """Compile the shared library; returns success."""
    if _LIB_PATH.exists() and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True
        )
        return _LIB_PATH.exists()
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not build_native():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.an_read_wav.restype = ctypes.POINTER(ctypes.c_float)
    lib.an_read_wav.argtypes = [ctypes.c_char_p, ctypes.POINTER(_WavInfo)]
    lib.an_write_wav.restype = ctypes.c_int
    lib.an_write_wav.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.an_free.argtypes = [ctypes.c_void_p]
    lib.an_vad_is_silent.restype = ctypes.c_int
    lib.an_vad_is_silent.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_float, ctypes.c_int32, ctypes.c_float,
    ]
    lib.an_vad_gmm_is_silent.restype = ctypes.c_int
    lib.an_vad_gmm_is_silent.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_float, ctypes.c_int32, ctypes.c_float,
    ]
    lib.an_vad_gmm_flags.restype = ctypes.c_int64
    lib.an_vad_gmm_flags.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_float, ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    lib.an_pcm_quantize.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32
    ]
    lib.an_loader_create.restype = ctypes.c_void_p
    lib.an_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.an_loader_next.restype = ctypes.c_int32
    lib.an_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.an_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


# ------------------------------------------------------------- wrappers ---

def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Native WAV read; falls back to aware_tpu.utils.io.read_wav."""
    lib = get_lib()
    if lib is None:
        from aware_tpu.utils.io import read_wav as py_read

        return py_read(path)
    info = _WavInfo()
    ptr = lib.an_read_wav(path.encode(), ctypes.byref(info))
    if not ptr:
        raise ValueError(f"failed to read {path}")
    n = info.frames * info.channels
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib.an_free(ptr)
    if info.channels > 1:
        arr = arr.reshape(-1, info.channels)
    return arr, int(info.sample_rate)


def write_wav(path: str, audio: np.ndarray, sample_rate: int, bits: int = 16) -> None:
    lib = get_lib()
    if lib is None:
        from aware_tpu.utils.io import write_wav as py_write

        return py_write(path, audio, sample_rate, bits)
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    channels = 1 if audio.ndim == 1 else audio.shape[1]
    rc = lib.an_write_wav(
        path.encode(),
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        audio.shape[0], channels, sample_rate, bits,
    )
    if rc != 0:
        raise ValueError(f"failed to write {path} (rc={rc})")


def vad_is_silent(
    audio: np.ndarray,
    sample_rate: int = 16000,
    frame_ms: float = 30.0,
    aggressiveness: int = 3,
    min_speech_seconds: float = 0.01,
) -> bool:
    """Native silence gate; falls back to aware_tpu.ops.vad.is_silent."""
    lib = get_lib()
    if lib is None:
        from aware_tpu.ops.vad import is_silent

        return bool(is_silent(audio, sample_rate, frame_ms, aggressiveness,
                              min_speech_seconds))
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    return bool(
        lib.an_vad_is_silent(
            audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            audio.shape[-1], sample_rate, frame_ms, aggressiveness,
            min_speech_seconds,
        )
    )


def vad_gmm_is_silent(
    audio: np.ndarray,
    sample_rate: int = 16000,
    frame_ms: float = 30.0,
    aggressiveness: int = 3,
    min_speech_seconds: float = 0.01,
) -> bool:
    """Reference-faithful GMM silence gate (WebRTC VAD architecture: 6-band
    allpass filterbank, adaptive 2-component GMMs, LLR tests, hangover —
    see aware_native.cc).  Requires the native library (no Python
    fallback; use :func:`vad_is_silent` / ops.vad otherwise).

    Inherits webrtcvad's documented false-positive tendency on loud
    stationary noise and tones; the service's default spectral gate
    rejects those (a documented improvement over the reference)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable (no C++ toolchain)")
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    rc = lib.an_vad_gmm_is_silent(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        audio.shape[-1], sample_rate, frame_ms, aggressiveness,
        min_speech_seconds,
    )
    return bool(rc)


def vad_gmm_flags(
    audio: np.ndarray,
    sample_rate: int = 16000,
    frame_ms: float = 30.0,
    aggressiveness: int = 3,
) -> np.ndarray:
    """Per-frame voiced decisions from the GMM VAD -> bool (n_frames,)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable (no C++ toolchain)")
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    frame_len = int(sample_rate * frame_ms / 1000.0)
    n_frames = audio.shape[-1] // frame_len
    flags = np.zeros(max(n_frames, 1), dtype=np.uint8)
    n = lib.an_vad_gmm_flags(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        audio.shape[-1], sample_rate, frame_ms, aggressiveness,
        flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_frames,
    )
    if n < 0:
        raise ValueError("unsupported sample rate / frame length for GMM VAD")
    return flags[:n].astype(bool)


def pcm_quantize(audio: np.ndarray, bits: int) -> np.ndarray:
    lib = get_lib()
    out = np.ascontiguousarray(audio, dtype=np.float32).copy()
    if lib is None:
        from aware_tpu.attacks import PCMBitDepthConversion

        return PCMBitDepthConversion(bits).apply(out, 0)
    lib.an_pcm_quantize(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size, bits
    )
    return out


class BatchLoader:
    """Multithreaded prefetching WAV batch loader (native; production
    ingest path).  Yields (data (B, L) float32, lengths (B,), rates (B,))
    in deterministic file order; short final batches are zero-padded with
    the valid count reported."""

    def __init__(
        self,
        files: Sequence[str],
        batch: int,
        length: int,
        n_threads: int = 4,
        prefetch: int = 2,
    ):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable; build g++ first")
        self._lib = lib
        self.batch, self.length = batch, length
        self._paths = [str(f).encode() for f in files]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = lib.an_loader_create(
            arr, len(self._paths), batch, length, n_threads, prefetch
        )
        self._closed = False

    def __iter__(self):
        return self

    def __next__(self):
        data = np.empty((self.batch, self.length), np.float32)
        lengths = np.empty(self.batch, np.int64)
        rates = np.empty(self.batch, np.int32)
        count = self._lib.an_loader_next(
            self._handle,
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if count < 0:
            self.close()
            raise StopIteration
        return data, lengths, rates, count

    def close(self):
        if not self._closed:
            self._lib.an_loader_destroy(self._handle)
            self._closed = True

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
