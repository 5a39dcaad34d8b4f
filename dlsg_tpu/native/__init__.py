"""Native C++ metric components (ctypes loader).

Builds/loads `libdlsg_native.so` (PTB tokenizer, Porter2 stemmer, METEOR
aligner — see ptb_meteor.cpp). The Python implementations in dlsg_tpu/metrics
remain the reference behavior; the native library is a drop-in accelerated
equivalent, verified identical in tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libdlsg_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _stale() -> bool:
    """Source newer than the built .so (builds are on-demand, not tracked)."""
    if not os.path.exists(_LIB_PATH):
        return True
    so_m = os.path.getmtime(_LIB_PATH)
    for src in ("ptb_meteor.cpp", "Makefile"):
        p = os.path.join(_HERE, src)
        if os.path.exists(p) and os.path.getmtime(p) > so_m:
            return True
    return False


def build(force: bool = False) -> bool:
    """Compile the shared library with make (g++). Returns success."""
    if not _stale() and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", _HERE, "libdlsg_native.so"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building on demand); returns None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not build():  # no-op when fresh; recompiles when sources changed
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.dlsg_ptb_tokenize.restype = ctypes.c_int
        lib.dlsg_ptb_tokenize.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ]
        lib.dlsg_porter2_stem.restype = ctypes.c_int
        lib.dlsg_porter2_stem.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ]
        lib.dlsg_meteor_stats.restype = ctypes.c_int
        lib.dlsg_meteor_stats.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
        ]
        lib.dlsg_meteor_load_synonyms.restype = ctypes.c_int
        lib.dlsg_meteor_load_synonyms.argtypes = [ctypes.c_char_p]
        lib.dlsg_meteor_load_paraphrases.restype = ctypes.c_int
        lib.dlsg_meteor_load_paraphrases.argtypes = [ctypes.c_char_p]
        lib.dlsg_meteor_load_phrases.restype = ctypes.c_int
        lib.dlsg_meteor_load_phrases.argtypes = [ctypes.c_char_p]
        lib.dlsg_meteor_load_function_words.restype = ctypes.c_int
        lib.dlsg_meteor_load_function_words.argtypes = [ctypes.c_char_p]
        lib.dlsg_meteor_reset_function_words.restype = ctypes.c_int
        lib.dlsg_meteor_reset_function_words.argtypes = []
        # install the same default stage-2/3 tables the Python METEOR uses
        _install_default_tables(lib)
        _lib = lib
    except (OSError, AttributeError):
        # AttributeError: a stale prebuilt .so that predates a newly-bound
        # symbol (and escaped the mtime check, e.g. copied files) — fall back
        # to the Python implementations instead of crashing every scorer
        _lib = None
    return _lib


def _install_default_tables(lib: ctypes.CDLL) -> None:
    lib.dlsg_meteor_reset_function_words()
    data = os.path.join(os.path.dirname(_HERE), "metrics", "data")
    syn = os.path.join(data, "synonyms.txt")
    if os.path.exists(syn):
        lib.dlsg_meteor_load_synonyms(syn.encode())
    para = os.path.join(data, "paraphrases.txt")
    if os.path.exists(para):
        lib.dlsg_meteor_load_paraphrases(para.encode())
    phrases = os.path.join(data, "phrase_paraphrases.txt")
    if os.path.exists(phrases):
        lib.dlsg_meteor_load_phrases(phrases.encode())


def reload_default_tables() -> None:
    """Re-install the shipped METEOR tables into an already-loaded library
    (undoes custom tables mirrored by metrics.meteor.load_paraphrase_file;
    no-op when the library was never loaded)."""
    if _lib is not None:
        _install_default_tables(_lib)


def available() -> bool:
    return load() is not None


def ptb_tokenize(line: str, lowercase: bool = True) -> Optional[List[str]]:
    """Native tokenize; None if the library is unavailable or input non-ASCII."""
    lib = load()
    if lib is None or not line.isascii():
        return None
    buf = ctypes.create_string_buffer(4 * len(line) + 64)
    n = lib.dlsg_ptb_tokenize(line.encode(), int(lowercase), buf, len(buf))
    if n < 0 or n >= len(buf):
        return None
    return buf.value.decode().split()


def porter2_stem(word: str) -> Optional[str]:
    lib = load()
    if lib is None or not word.isascii():
        return None
    buf = ctypes.create_string_buffer(2 * len(word) + 16)
    n = lib.dlsg_porter2_stem(word.encode(), buf, len(buf))
    if n < 0 or n >= len(buf):
        return None
    return buf.value.decode()


def meteor_stats(hyp: str, ref: str):
    """(wp_num, wp_den, wr_num, wr_den, chunks, matches) or None."""
    lib = load()
    if lib is None or not (hyp.isascii() and ref.isascii()):
        return None
    stats = (ctypes.c_double * 6)()
    if lib.dlsg_meteor_stats(hyp.encode(), ref.encode(), stats) != 0:
        return None
    return tuple(stats)
