"""ctypes bindings for the C++ native runtime (no pybind11 in this image).

Public surface:
  * ``Sf2Synth`` — soundfont renderer (fluidsynth replacement)
  * ``render_simple`` — additive fallback synth (no soundfont required)
  * ``decode_audio_file`` / ``encode_audio_file`` — compressed audio
    (m4a/AAC, mp3, ogg, flac, ...) via the lavf/lavc-linked C++ module
    (in-process replacement for the reference's per-file ffmpeg subprocess,
    AB/memoToWav.py:11-26)

All return/accept float32 numpy audio.
"""

from __future__ import annotations

import ctypes

import numpy as np

from audax.core.logging import get_logger
from audax.symbolic.midi import MidiFile

log = get_logger("audax.native")


class _NoteEvent(ctypes.Structure):
    _fields_ = [
        ("start", ctypes.c_double),
        ("duration", ctypes.c_double),
        ("pitch", ctypes.c_int32),
        ("velocity", ctypes.c_int32),
        ("program", ctypes.c_int32),
    ]


_lib = None


def load_library():
    """Build (if stale) and load the native library; raises on toolchain
    failure — callers that can fall back should catch OSError/CalledProcessError."""
    global _lib
    if _lib is not None:
        return _lib
    from audax.native.build import build
    path = build()
    lib = ctypes.CDLL(path)
    lib.sf2_open.restype = ctypes.c_void_p
    lib.sf2_open.argtypes = [ctypes.c_char_p]
    lib.sf2_close.argtypes = [ctypes.c_void_p]
    lib.sf2_preset_count.argtypes = [ctypes.c_void_p]
    lib.sf2_preset_count.restype = ctypes.c_int
    lib.sf2_preset_info.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.POINTER(ctypes.c_int)]
    lib.sf2_render.argtypes = [ctypes.c_void_p, ctypes.POINTER(_NoteEvent),
                               ctypes.c_int, ctypes.c_double,
                               ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.sf2_render.restype = ctypes.c_int
    lib.synth_render_simple.argtypes = lib.sf2_render.argtypes[1:]
    lib.synth_render_simple.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    try:
        load_library()
        return True
    except Exception as e:  # pragma: no cover - toolchain missing
        log.warning("native library unavailable: %s", e)
        return False


_decode_lib = None


def load_decode_library():
    """Build (if stale) and load the compressed-audio module. Raises when
    the system ffmpeg dev libraries are absent — use decode_available()."""
    global _decode_lib
    if _decode_lib is not None:
        return _decode_lib
    from audax.native.build import build_decode
    lib = ctypes.CDLL(build_decode())
    lib.audax_decode_audio.restype = ctypes.c_int
    lib.audax_decode_audio.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.audax_encode_audio.restype = ctypes.c_int
    lib.audax_encode_audio.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.c_int, ctypes.c_int]
    lib.audax_audio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    _decode_lib = lib
    return lib


def decode_available() -> bool:
    try:
        load_decode_library()
        return True
    except Exception as e:  # pragma: no cover - no lavc on host
        log.warning("audio decode module unavailable: %s", e)
        return False


def decode_audio_file(path: str):
    """Decode any lavf-supported file -> (float32 [n, channels], rate)."""
    lib = load_decode_library()
    buf = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_long()
    ch = ctypes.c_int()
    sr = ctypes.c_int()
    rc = lib.audax_decode_audio(path.encode(), ctypes.byref(buf),
                                ctypes.byref(n), ctypes.byref(ch),
                                ctypes.byref(sr))
    if rc != 0:
        raise ValueError(f"decode failed (rc={rc}): {path}")
    try:
        out = np.ctypeslib.as_array(buf, shape=(n.value, ch.value)).copy()
    finally:
        lib.audax_audio_free(buf)
    return out, sr.value


def encode_audio_file(path: str, audio: np.ndarray, sample_rate: int) -> None:
    """Encode float32 audio ([n] or [n, channels]) to ``path`` (container/
    codec chosen from the extension; AAC for .m4a)."""
    lib = load_decode_library()
    a = np.asarray(audio, np.float32)
    if a.ndim == 1:
        a = a[:, None]
    a = np.ascontiguousarray(a)
    rc = lib.audax_encode_audio(
        path.encode(), a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        a.shape[0], a.shape[1], int(sample_rate))
    if rc != 0:
        raise ValueError(f"encode failed (rc={rc}): {path}")


def _events_from_midi(mf: MidiFile, program: int) -> "ctypes.Array":
    notes = mf.notes_with_times()
    arr = (_NoteEvent * len(notes))()
    for i, (start, end, n) in enumerate(notes):
        arr[i] = _NoteEvent(start, max(end - start, 1e-3), n.pitch,
                            n.velocity, program)
    return arr


def _out_buffer(mf: MidiFile, sample_rate: int, tail_s: float) -> np.ndarray:
    frames = int((mf.duration_seconds + tail_s) * sample_rate) + 1
    return np.zeros(max(frames, 1), dtype=np.float32)


def _normalize(out: np.ndarray) -> np.ndarray:
    peak = float(np.abs(out).max()) if out.size else 0.0
    if peak > 0.99:
        out *= 0.99 / peak
    return out


class Sf2Synth:
    """Soundfont renderer over the C++ module."""

    def __init__(self, sf2_path: str):
        self._lib = load_library()
        self._handle = self._lib.sf2_open(sf2_path.encode())
        if not self._handle:
            raise ValueError(f"failed to parse soundfont: {sf2_path}")
        self.path = sf2_path

    @property
    def preset_count(self) -> int:
        return self._lib.sf2_preset_count(self._handle)

    def presets(self):
        out = []
        for i in range(self.preset_count):
            bank = ctypes.c_int()
            program = ctypes.c_int()
            zones = ctypes.c_int()
            self._lib.sf2_preset_info(self._handle, i, ctypes.byref(bank),
                                      ctypes.byref(program), ctypes.byref(zones))
            out.append({"bank": bank.value, "program": program.value,
                        "zones": zones.value})
        return out

    def render(self, mf: MidiFile, sample_rate: int = 16000, *,
               program: int = 0, tail_s: float = 0.3) -> np.ndarray:
        """MidiFile -> float32 waveform at ``sample_rate`` (16 kHz default,
        the reference's contract, AB/synthDataset.py:36)."""
        events = _events_from_midi(mf, program)
        out = _out_buffer(mf, sample_rate, tail_s)
        n = self._lib.sf2_render(
            self._handle, events, len(events), float(sample_rate),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size)
        if n < 0:
            raise RuntimeError("sf2_render failed")
        if n < len(events):
            log.warning("rendered %d/%d notes (missing zones)", n, len(events))
        return _normalize(out)

    def close(self) -> None:
        if self._handle:
            self._lib.sf2_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def render_simple(mf: MidiFile, sample_rate: int = 16000, *,
                  tail_s: float = 0.3) -> np.ndarray:
    """Soundfont-free additive synth (C++); always available once the
    toolchain builds."""
    lib = load_library()
    events = _events_from_midi(mf, -1)
    out = _out_buffer(mf, sample_rate, tail_s)
    lib.synth_render_simple(
        events, len(events), float(sample_rate),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size)
    return _normalize(out)
