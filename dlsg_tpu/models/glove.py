"""GloVe word-embedding import.

Parity with `Decoder.get_glove_embedding` (models/layer.py:352-386): build a
[vocab, word_size] matrix from a GloVe text file (word + vector per line),
trailing-comma cleanup on vocab words, N(0, 0.6) init for missing words, and an
.npy cache keyed by dataset. The trainer grafts the matrix into the decoder's
`word_embed` params after init (and can freeze it, mirroring
`requires_grad=False` at model.py:52-53).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from dlsg_tpu.vocab import Vocabulary


def load_glove_matrix(
    vocab: Vocabulary,
    word_size: int,
    glove_txt_path: str,
    cache_npy_path: Optional[str] = None,
    seed: int = 0,
) -> np.ndarray:
    if cache_npy_path and os.path.exists(cache_npy_path):
        return np.load(cache_npy_path)

    glove = {}
    with open(glove_txt_path, "rb") as f:
        for raw in f:
            parts = raw.decode(errors="ignore").split()
            if len(parts) != word_size + 1:
                continue
            glove[parts[0]] = np.asarray(parts[1:], dtype=np.float64)

    rng = np.random.default_rng(seed)
    weights = np.zeros((len(vocab), word_size), np.float64)
    found = 0
    for i, word in enumerate(vocab.idx2word):
        if word.endswith(","):  # layer.py:372-373
            word = word[:-1]
        vec = glove.get(word)
        if vec is not None:
            weights[i] = vec
            found += 1
        else:
            weights[i] = rng.normal(scale=0.6, size=(word_size,))  # layer.py:379
    if cache_npy_path:
        os.makedirs(os.path.dirname(cache_npy_path) or ".", exist_ok=True)
        np.save(cache_npy_path, weights)
    return weights


def graft_word_embedding(params, matrix: np.ndarray):
    """Replace the decoder's word_embed table inside a CapGnn* params tree."""
    import jax.numpy as jnp

    emb = params["decoder"]["step"]["word_embed"]["embedding"]
    assert emb.shape == matrix.shape, (emb.shape, matrix.shape)
    new = dict(params)
    new_dec = dict(new["decoder"])
    new_step = dict(new_dec["step"])
    new_step["word_embed"] = {"embedding": jnp.asarray(matrix, jnp.float32)}
    new_dec["step"] = new_step
    new["decoder"] = new_dec
    return new
