"""ctypes bindings for the native C++ CIDEr scorer (csrc/cider.cc).

Auto-builds the shared library on first use when a compiler is present;
falls back to the pure-Python implementation otherwise.  The two are
score-equivalent (tests enforce 1e-9), and both match the reference's
vendored coco-caption scorer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_SO = os.path.join(_CSRC, "libcaptionax_cider.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", _CSRC], check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.cider_score.restype = ctypes.c_int
    lib.cider_score.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int64),
        ctypes.c_int64,
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.float64),
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _blob(sentences: Sequence[str]) -> Tuple[bytes, np.ndarray]:
    encoded = [s.encode("utf-8") for s in sentences]
    offs = np.zeros(len(encoded) + 1, np.int64)
    for i, e in enumerate(encoded):
        offs[i + 1] = offs[i] + len(e)
    return b"".join(encoded), offs


def cider_score_native(
    hypotheses: Sequence[str],
    references: Sequence[Sequence[str]],
) -> Tuple[float, np.ndarray]:
    """Drop-in for captionax.eval.cider.cider_score (n_max=4)."""
    lib = _load()
    if lib is None:
        from captionax.eval.cider import cider_score

        return cider_score(hypotheses, references)
    num = len(hypotheses)
    if num == 0:
        return 0.0, np.zeros((0,))
    hyp_blob, hyp_offs = _blob(hypotheses)
    flat_refs = [r for refs in references for r in refs]
    ref_blob, ref_offs = _blob(flat_refs)
    ref_index = np.zeros(num + 1, np.int64)
    for i, refs in enumerate(references):
        ref_index[i + 1] = ref_index[i] + len(refs)
    out = np.zeros(num, np.float64)
    rc = lib.cider_score(
        hyp_blob, hyp_offs, num, ref_blob, ref_offs, ref_index, out
    )
    if rc != 0:  # pragma: no cover
        raise RuntimeError(f"native cider failed with code {rc}")
    return float(out.mean()), out
