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

import os
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

# The reference fetches GloVe-6B through torchtext from this mirror
# (reference: libs/data/tokenizer.py:19); we fetch the same archive
# directly (no torchtext dependency) into a local cache.
GLOVE_URLS = {
    "6B": "https://huggingface.co/stanfordnlp/glove/resolve/main/"
          "glove.6B.zip",
}
_DEFAULT_GLOVE_DIM = {"6B": 300}  # torchtext's GloVe(name='6B') default


def fetch_glove(name="6B", dim=None, cache_dir=None):
    """Download + extract GloVe vectors, returning the local txt path
    (torchtext-equivalent auto-fetch, reference: libs/data/tokenizer.py:
    15-44). The download is cached; offline environments with a warm cache
    never touch the network, and a cold cache raises a clear error."""
    import urllib.error
    import urllib.request
    import zipfile

    dim = dim or _DEFAULT_GLOVE_DIM[name]
    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "decafnet_tpu", "glove")
    txt = os.path.join(cache_dir, f"glove.{name}.{dim}d.txt")
    if os.path.exists(txt):
        return txt
    os.makedirs(cache_dir, exist_ok=True)
    url = GLOVE_URLS[name]
    archive = os.path.join(cache_dir, os.path.basename(url))
    if not os.path.exists(archive):
        tmp = archive + ".part"
        try:
            urllib.request.urlretrieve(url, tmp)
        except (urllib.error.URLError, OSError) as e:
            raise RuntimeError(
                f"GloVe auto-fetch from {url} failed ({e}); download "
                f"manually and pass vectors_path, or warm {cache_dir}"
            ) from e
        os.replace(tmp, archive)
    with zipfile.ZipFile(archive) as z:
        member = os.path.basename(txt)
        names = z.namelist()
        if member not in names:
            raise RuntimeError(
                f"{archive} has no {member}; archive contains {names}")
        z.extract(member, cache_dir)
    return txt


def make_tokenizer(spec):
    """Factory. ``spec`` may be None, a name ('glove' auto-fetches GloVe-6B
    like the reference's torchtext path, libs/data/tokenizer.py:15-44), or
    a {name, **kwargs} dict; dict specs accept either ``vectors_path`` (a
    local GloVe-format txt) or auto-fetch kwargs (``fetch``/``dim``/
    ``cache_dir``)."""
    if spec is None:
        return None
    if isinstance(spec, str):
        spec = {"name": spec}
    spec = dict(spec)
    name = spec.pop("name")
    if name == "glove" and "vectors_path" not in spec:
        spec["vectors_path"] = fetch_glove(
            spec.pop("fetch", "6B"), dim=spec.get("dim"),
            cache_dir=spec.pop("cache_dir", None))
    return TOKENIZERS[name](**spec)
