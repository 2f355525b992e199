"""Real codec attacks via the in-process libavcodec shim.

The reference's only lossy-codec attack is MP3 (reference:
scripts/attacks.py:73-148, shelling out to the ffmpeg binary).  This image
has no ffmpeg binary but ships the FFmpeg 5.1 *libraries* with dev
headers, so ``aware_tpu/_native/aware_codecs.cc`` runs any encoder→decoder
pair fully in-process (raw packets, no container) and this module exposes
the deployment-relevant families as harness attacks:

* **AAC** (``aac_{kbps}k``) — the most widely deployed lossy codec
  (streaming, broadcast, Bluetooth); FFmpeg's native encoder at the
  input rate (16 kHz is AAC-native).
* **Vorbis** (``vorbis_q{q}``) — libvorbis VBR, the classic open codec.
* **Speex** (``speex_wb``) — legacy VoIP wideband (libspeex at 16 kHz).
* **G.722** (``g722``) — 64 kb/s wideband telephony ADPCM, natively
  16 kHz: exactly the conferencing leg a speech watermark crosses.

All decode legs are aligned to the input by cross-correlation and
trimmed to the input length (the shared :func:`_align` used by every
real-codec attack), so they compose with the eval harness like the
MP3/Opus/GSM rows.  Everything degrades loudly: the classes raise at
construction when the shim or its codec is unavailable, and
:func:`avc_available` gates the extended suite.
"""

from __future__ import annotations

import ctypes
import dataclasses
import functools
import pathlib
import subprocess

import numpy as np

from aware_tpu.attacks.voice_codecs import _align

__all__ = [
    "avc_available",
    "avc_roundtrip",
    "AACCompression",
    "VorbisCompression",
    "SpeexWideband",
    "G722Telephony",
]

_NATIVE_DIR = pathlib.Path(__file__).parent.parent / "_native"
_LIB_PATH = _NATIVE_DIR / "libaware_codecs.so"


@functools.lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL | None:
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR), "libaware_codecs.so"],
                check=True, capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
        if not _LIB_PATH.exists():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.aware_avc_has.restype = ctypes.c_int
    lib.aware_avc_has.argtypes = [ctypes.c_char_p]
    lib.aware_avc_roundtrip.restype = ctypes.c_int
    lib.aware_avc_roundtrip.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_longlong, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    return lib


def avc_available(codec: str | None = None) -> bool:
    """True when the shim builds/loads (and, if given, `codec` exists)."""
    lib = _lib()
    if lib is None:
        return False
    return codec is None or bool(lib.aware_avc_has(codec.encode()))


def avc_roundtrip(
    x: np.ndarray,
    sr: int,
    codec: str,
    bitrate_bps: int = 0,
    q_scale: float = -1.0,
) -> np.ndarray:
    """Encode→decode mono float32 through a real libavcodec codec.

    ``bitrate_bps`` > 0 selects bitrate mode; else ``q_scale`` >= 0
    selects the encoder's VBR quality mode; both unset means codec
    defaults.  Output is delay-aligned and trimmed to ``len(x)``.
    """
    lib = _lib()
    if lib is None:
        raise RuntimeError("libaware_codecs.so unavailable (no libavcodec?)")
    mono = np.ascontiguousarray(np.asarray(x, np.float32).reshape(-1))
    cap = len(mono) + 3 * sr + 8192  # room for codec delay + rate slack
    enospc = -28  # AVERROR(ENOSPC): native shim reports a truncated decode
    for _ in range(3):  # grow the buffer if a codec expands more than that
        out = np.zeros(cap, np.float32)
        n = lib.aware_avc_roundtrip(
            codec.encode(), int(sr), int(bitrate_bps), float(q_scale),
            mono.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(mono),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
        )
        if n != enospc:
            break
        cap *= 2
    if n <= 0:
        raise RuntimeError(f"avc roundtrip failed for {codec!r}: rc={n}")
    return _align(out[:n], mono)


def _require(codec: str, row: str) -> None:
    if not avc_available(codec):
        raise RuntimeError(
            f"libavcodec codec {codec!r} unavailable — {row} attack "
            "cannot run (the rest of the suite still works)"
        )


@dataclasses.dataclass
class AACCompression:
    """Real AAC-LC round-trip (no reference counterpart — the reference
    stops at MP3; AAC is the dominant deployed lossy codec)."""

    bitrate_kbps: int = 64

    def __post_init__(self):
        self.name = f"aac_{self.bitrate_kbps}k"
        _require("aac", self.name)

    def apply(self, audio, sr, key=None):
        return avc_roundtrip(audio, sr, "aac", self.bitrate_kbps * 1000)


@dataclasses.dataclass
class VorbisCompression:
    """Real Vorbis VBR round-trip via libvorbis (quality -1..10)."""

    quality: float = 3.0

    def __post_init__(self):
        self.name = f"vorbis_q{self.quality:g}"
        _require("libvorbis", self.name)

    def apply(self, audio, sr, key=None):
        return avc_roundtrip(audio, sr, "libvorbis", 0, self.quality)


@dataclasses.dataclass
class SpeexWideband:
    """Legacy VoIP wideband leg: libspeex at its native 16 kHz.

    Speex is parametric CELP — it does NOT preserve waveform phase, so
    the decoded clip's waveform SNR vs the input is near 0 dB even
    though speech (and spectral magnitudes) come through.  That makes
    this the harshest codec row in the suite by design.
    """

    def __post_init__(self):
        self.name = "speex_wb"
        _require("libspeex", self.name)

    def apply(self, audio, sr, key=None):
        return avc_roundtrip(audio, sr, "libspeex")


@dataclasses.dataclass
class G722Telephony:
    """G.722 64 kb/s wideband-telephony ADPCM (natively 16 kHz)."""

    def __post_init__(self):
        self.name = "g722"
        _require("g722", self.name)

    def apply(self, audio, sr, key=None):
        return avc_roundtrip(audio, sr, "g722", 64000)
