"""Vocabulary.

Parity with the reference `utils/utils.py:12-43` (`Vocabulary`), including the
special-token layout `<pad>=0, <start>=1, <end>=2, <unk>=3` that the decoder,
beam search, masking, and detokenization all rely on.

The reference *unpickles* Vocabulary instances from dataset pkl files
(`train_debug.py:25-26`). We support loading those pkls (they reference the class
by module path `utils.utils`) via a tolerant unpickler, plus our own JSON format.
"""

from __future__ import annotations

import json
import pickle
from typing import Iterable, List


PAD, START, END, UNK = "<pad>", "<start>", "<end>", "<unk>"
PAD_ID, START_ID, END_ID, UNK_ID = 0, 1, 2, 3


class Vocabulary:
    """word <-> index map with fixed special tokens (utils/utils.py:12-43)."""

    def __init__(self) -> None:
        self.word2idx = {}
        self.idx2word: List[str] = []
        self.nwords = 0
        for w in (PAD, START, END, UNK):
            self.add_word(w)

    def add_word(self, w: str) -> None:
        if w not in self.word2idx:
            self.word2idx[w] = self.nwords
            self.idx2word.append(w)
            self.nwords += 1

    def __call__(self, w: str) -> int:
        return self.word2idx.get(w, self.word2idx[UNK])

    def __len__(self) -> int:
        return self.nwords

    # ---- construction helpers ----
    @classmethod
    def from_words(cls, words: Iterable[str]) -> "Vocabulary":
        v = cls()
        for w in words:
            v.add_word(w)
        return v

    @classmethod
    def from_idx2word(cls, idx2word) -> "Vocabulary":
        """Rebuild from a saved id->word list (json / bundle serialization)."""
        v = cls.__new__(cls)
        v.idx2word = list(idx2word)
        v.word2idx = {w: i for i, w in enumerate(v.idx2word)}
        v.nwords = len(v.idx2word)
        return v

    # ---- serialization ----
    def save_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.idx2word, f)

    @classmethod
    def load_json(cls, path: str) -> "Vocabulary":
        with open(path) as f:
            return cls.from_idx2word(json.load(f))

    @classmethod
    def load_reference_pkl(cls, path: str) -> "Vocabulary":
        """Import a pickled Vocabulary produced by the reference codebase.

        Reference pkls store the class by its original module path
        (`utils.utils.Vocabulary`); we remap it onto this class so users can
        bring their existing vocab files unchanged (train_debug.py:25-26).
        """

        this = cls

        class _Remap(pickle.Unpickler):
            def find_class(self, module, name):  # noqa: D401
                if name == "Vocabulary":
                    return this
                return super().find_class(module, name)

        with open(path, "rb") as f:
            obj = _Remap(f).load()
        if not isinstance(obj, cls):  # plain dict/list fallbacks
            raise TypeError(f"unsupported vocab pickle payload: {type(obj)!r}")
        return obj

    @classmethod
    def build_from_references(cls, reference_txt_path: str, min_count: int = 1) -> "Vocabulary":
        """Build a vocabulary from a `vid\\tsentence` reference file.

        Convenience for users without the reference's preprocessed vocab pkls
        (which were produced by an out-of-repo pipeline). Tokens come from the
        same PTB-style tokenizer used for scoring.
        """
        from collections import Counter

        from dlsg_tpu.metrics.tokenizer import PUNCTUATIONS, ptb_tokenize_line

        punct = set(PUNCTUATIONS)
        counts: Counter = Counter()
        with open(reference_txt_path) as f:
            for line in f:
                if "\t" not in line:
                    continue
                _, sent = line.split("\t", 1)
                counts.update(t for t in ptb_tokenize_line(sent.strip()) if t not in punct)
        words = [w for w, c in sorted(counts.items()) if c >= min_count]
        return cls.from_words(words)

    # ---- decoding ----
    def decode_tokens(self, tokens) -> str:
        """Token ids -> caption string, truncating at the first <end>.

        Mirrors `Decoder.decode_tokens` (models/layer.py:464-477): tokens before
        the first `<end>` are joined with spaces; `<pad>`/`<start>` are NOT
        stripped (the reference keeps them, but they never occur after training).
        """
        words = []
        for t in tokens:
            t = int(t)
            if t == END_ID:
                break
            words.append(self.idx2word[t])
        return " ".join(words)
