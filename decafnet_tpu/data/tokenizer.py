"""Word-vector tokenizer (reference: libs/data/tokenizer.py).

The reference uses torchtext's GloVe-6B lookup with a ``basic_english``
tokenizer and zero vectors for unknown words. torchtext is not a dependency
here (and needs network for the vectors), so this is a self-contained
implementation over a local GloVe-format text file
(``word v1 v2 ... vD`` per line):

  * basic_english-equivalent normalization: lowercase, punctuation split;
  * unknown words -> zero vector, with lowercase backup;
  * returns (c, t) float32 like the reference.

Only used when token features are not precomputed (the live DeCafNet
datasets ship precomputed CLIP token features, libs/data/dataset.py:804+).
"""

from __future__ import annotations

import re

import numpy as np

_PATTERNS = [
    (re.compile(r"\'"), " '  "),
    (re.compile(r"\""), ""),
    (re.compile(r"\."), " . "),
    (re.compile(r"<br \/>"), " "),
    (re.compile(r","), " , "),
    (re.compile(r"\("), " ( "),
    (re.compile(r"\)"), " ) "),
    (re.compile(r"\!"), " ! "),
    (re.compile(r"\?"), " ? "),
    (re.compile(r"\;"), " "),
    (re.compile(r"\:"), " "),
    (re.compile(r"\s+"), " "),
]


def basic_english_tokenize(text):
    """torchtext ``basic_english`` normalization: lowercase + punctuation
    splitting + whitespace tokenization."""
    text = text.lower()
    for pattern, repl in _PATTERNS:
        text = pattern.sub(repl, text)
    return text.strip().split()


class GloVeTokenizer:
    """Embeds a sentence as a (dim, n_words) matrix of word vectors."""

    def __init__(self, vectors_path, dim=None, max_words=None):
        """Args:
          vectors_path: GloVe-format text file (word + floats per line).
          dim: expected vector dimension (validated if given).
          max_words: optionally cap the vocabulary (memory control).
        """
        self.vocab = {}
        self.dim = dim
        with open(vectors_path, "r", encoding="utf-8") as f:
            for i, line in enumerate(f):
                if max_words is not None and i >= max_words:
                    break
                parts = line.rstrip().split(" ")
                word = parts[0]
                vec = np.asarray(parts[1:], np.float32)
                if self.dim is None:
                    self.dim = len(vec)
                if len(vec) != self.dim:
                    continue
                self.vocab[word] = vec
        assert self.dim, "empty vector file"
        self._zero = np.zeros((self.dim,), np.float32)

    def lookup(self, word):
        """Unknown words get the zero vector; lowercase as backup
        (reference: get_vecs_by_tokens(..., lower_case_backup=True))."""
        if word in self.vocab:
            return self.vocab[word]
        return self.vocab.get(word.lower(), self._zero)

    def __call__(self, text, max_len=None):
        words = basic_english_tokenize(text)
        if not words:
            words = [""]
        feats = np.stack([self.lookup(w) for w in words])
        if max_len is not None:
            feats = feats[:max_len]
        return np.ascontiguousarray(feats.T)  # (c, t)


TOKENIZERS = {"glove": GloVeTokenizer}


def make_tokenizer(spec):
    """Factory. ``spec`` may be None, a name, or a {name, **kwargs} dict
    (reference: libs/data/tokenizer.py:44 -- but file-path based here)."""
    if spec is None:
        return None
    if isinstance(spec, str):
        raise ValueError(
            "glove tokenizer needs a vectors file: pass "
            "{'name': 'glove', 'vectors_path': ...}")
    spec = dict(spec)
    name = spec.pop("name")
    return TOKENIZERS[name](**spec)
