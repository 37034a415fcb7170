"""ctypes binding for the native C++ batched WAV loader.

The reference feeds its trainers through torch DataLoaders with 8 worker
*processes* (``DiffWave_Unconditional/distributed_util.py``,
``train_classifier.py`` loaders); here the data plane is an in-process C++
thread pool (``native/wav_loader.cc``) that decodes a whole batch with the
GIL released — composing with ``data.prefetch``'s background thread for a
fully native IO pipeline, no worker processes or IPC.

The shared library is built lazily with ``g++`` on first use and cached
next to the source; every entry point falls back to the pure-Python
``wav_io.read_wav`` path (bit-identical decode semantics, tested) when the
toolchain or library is unavailable, or when ``DMAD_NO_NATIVE=1``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB: object = None  # None = not attempted, False = unavailable, else CDLL

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "wav_loader.cc")
_SO = os.path.join(os.path.dirname(_SRC), "libdmad_wav.so")


def _build() -> str | None:
    """Compile the loader next to its source (atomic rename); None on failure."""
    try:
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(_SRC))
        os.close(fd)
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", _SRC, "-o", tmp]
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        if r.returncode != 0:
            os.unlink(tmp)
            return None
        os.replace(tmp, _SO)
        return _SO
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB or None
    with _LOCK:
        if _LIB is not None:
            return _LIB or None
        if os.environ.get("DMAD_NO_NATIVE"):
            _LIB = False
            return None
        path = _SO
        if not os.path.exists(path) or os.path.getmtime(path) < os.path.getmtime(_SRC):
            path = _build()
        if path is None:
            _LIB = False
            return None
        try:
            lib = ctypes.CDLL(path)
            lib.dmad_load_wav_batch.restype = ctypes.c_int64
            lib.dmad_load_wav_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
                ctypes.c_int64, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_char_p, ctypes.c_int64,
            ]
            _LIB = lib
        except OSError:
            _LIB = False
    return _LIB or None


def native_available() -> bool:
    return _load_lib() is not None


def batch_read_wavs(
    paths,
    sample_rate: int = 16000,
    target_len: int | None = None,
    time: float = 1.0,
    n_threads: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode ``paths`` to a fixed-length float32 batch.

    Semantics == ``LoadAudio(sample_rate)`` then ``FixAudioLength(time)``
    per file (head-truncate / tail-zero-pad); empty path = one second of
    silence. Returns ``(samples (B, L) float32, lens (B,) int64)`` where
    ``lens`` is the decoded length before length-fixing. Uses the C++
    thread-pool loader when available, else the Python reader.
    """
    paths = list(paths)
    L = int(target_len) if target_len is not None else int(time * sample_rate)
    n = len(paths)
    out = np.zeros((n, L), dtype=np.float32)
    lens = np.zeros((n,), dtype=np.int64)
    if n == 0:
        return out, lens

    lib = _load_lib()
    if lib is not None:
        arr = (ctypes.c_char_p * n)(*[os.fsencode(p or "") for p in paths])
        err = ctypes.create_string_buffer(512)
        nfail = lib.dmad_load_wav_batch(
            arr, n, int(sample_rate), L, int(n_threads),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            err, len(err))
        if nfail:
            raise ValueError(
                f"native wav loader: {nfail}/{n} files failed "
                f"({err.value.decode(errors='replace')})")
        return out, lens

    from .wav_io import read_wav

    for i, p in enumerate(paths):
        if p:
            x, _ = read_wav(p, sample_rate)
        else:
            x = np.zeros(sample_rate, dtype=np.float32)
        lens[i] = len(x)
        m = min(len(x), L)
        out[i, :m] = x[:m]
    return out, lens


def wav_batch_collate(sample_rate: int = 16000, time: float = 1.0,
                      n_threads: int = 0):
    """Collate for ``data.DataLoader`` over path-only datasets: decodes the
    whole batch natively (one C++ thread-pool call, GIL released) instead of
    running ``LoadAudio``+``FixAudioLength`` per item in Python. Produces
    the same ``{'samples': (B, L) f32, 'sample_rate', 'target', 'path'}``
    batch dict as the per-item transform pipeline.
    """

    def collate(batch):
        paths = [item["path"] for item in batch]
        samples, _ = batch_read_wavs(paths, sample_rate=sample_rate, time=time,
                                     n_threads=n_threads)
        out = {"samples": samples,
               "sample_rate": np.full(len(batch), sample_rate, dtype=np.int64),
               "path": paths}
        if "target" in batch[0]:
            out["target"] = np.asarray([item["target"] for item in batch])
        return out

    return collate
