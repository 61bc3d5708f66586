"""ctypes bindings for the native host-side data-path library.

Every entry point has a pure-Python/numpy fallback; ``available()`` reports
whether the compiled library loaded. The library auto-builds on first import
when a toolchain is present (cached as libmlpt_native.so next to the source).
"""

import ctypes

import numpy as np

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    from .build import build

    path = build()
    if path is None:
        _lib = False
        return False
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        _lib = False
        return False
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.pad_batch.argtypes = [i32p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, i32p, i32p]
    lib.whole_word_mask.argtypes = [i32p, ctypes.c_int64, ctypes.c_double, ctypes.c_int64, ctypes.c_uint64, i32p]
    lib.random_lm_batch.argtypes = [ctypes.c_uint64, ctypes.c_int32, ctypes.c_int64, ctypes.c_int64, i32p]
    lib.mlm_corrupt.argtypes = [i32p, ctypes.c_int64, ctypes.c_double, ctypes.c_int32, ctypes.c_uint64, i32p, i32p]
    _lib = lib
    return lib


def available() -> bool:
    return bool(_load())


def pad_batch(seqs: list[list[int]], pad_value: int, max_len: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """(padded_ids, attention_mask) for a ragged int batch."""
    if max_len is None:
        max_len = max((len(s) for s in seqs), default=0)
    lib = _load()
    if not lib:
        ids = np.full((len(seqs), max_len), pad_value, np.int32)
        mask = np.zeros((len(seqs), max_len), np.int32)
        for i, s in enumerate(seqs):
            n = min(len(s), max_len)
            ids[i, :n] = s[:n]
            mask[i, :n] = 1
        return ids, mask
    flat = np.concatenate([np.asarray(s, np.int32) for s in seqs]) if seqs else np.zeros(0, np.int32)
    offsets = np.zeros(len(seqs) + 1, np.int64)
    np.cumsum([len(s) for s in seqs], out=offsets[1:])
    out_ids = np.empty((len(seqs), max_len), np.int32)
    out_mask = np.empty((len(seqs), max_len), np.int32)
    lib.pad_batch(np.ascontiguousarray(flat), offsets, len(seqs), max_len, pad_value, out_ids, out_mask)
    return out_ids, out_mask


def whole_word_mask_ids(word_ids: np.ndarray, mlm_probability: float, seed: int, max_predictions: int = 512) -> np.ndarray:
    """0/1 mask over tokens; tokens sharing a word id mask together
    (word_id < 0 = special, never masked)."""
    word_ids = np.ascontiguousarray(word_ids, np.int32)
    lib = _load()
    out = np.empty(word_ids.shape[0], np.int32)
    if not lib:
        raise RuntimeError("native library unavailable; use the python whole_word_mask")
    lib.whole_word_mask(word_ids, word_ids.shape[0], mlm_probability, max_predictions, seed, out)
    return out


def random_lm_batch(seed: int, vocab: int, batch: int, seq_len: int) -> np.ndarray:
    lib = _load()
    if not lib:
        return np.random.default_rng(seed).integers(0, vocab, (batch, seq_len), dtype=np.int32)
    out = np.empty((batch, seq_len), np.int32)
    lib.random_lm_batch(seed, vocab, batch, seq_len, out)
    return out


def mlm_corrupt(ids: np.ndarray, prob: float, mask_token: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    ids = np.ascontiguousarray(ids, np.int32)
    lib = _load()
    if not lib:
        rng = np.random.default_rng(seed)
        m = rng.random(ids.shape) < prob
        return np.where(m, mask_token, ids).astype(np.int32), np.where(m, ids, -100).astype(np.int32)
    out_ids = np.empty_like(ids)
    out_labels = np.empty_like(ids)
    lib.mlm_corrupt(ids.reshape(-1), ids.size, prob, mask_token, seed, out_ids.reshape(-1), out_labels.reshape(-1))
    return out_ids, out_labels
