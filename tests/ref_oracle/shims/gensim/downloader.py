"""gensim.downloader shim: deterministic fake pretrained word vectors.

``api.load('glove-wiki-gigaword-300' | 'word2vec-google-news-300')``
(common.py:172-175) returns a KeyedVectors-like store whose vector for a
word is a pure function of the WORD STRING (md5-seeded uniform(-1,1)) —
no network, stable across processes. The oracle harness exports the same
function's vectors into fumi_tpu's vector-artifact format so both
frameworks embed each token identically; every queried word is
in-vocabulary (``key_to_index`` membership is universal) so the
reference's OOV branch (common.py:183-192) — which would draw from the
process-global RNG and diverge between frameworks — never triggers.

This module is self-contained (no package-relative imports) so the
rebuild-side test can load it by file path and reuse ``fake_vector``.
"""

import hashlib

import numpy as np

FAKE_DIM = 48


def fake_vector(word, dim=FAKE_DIM):
    seed = int.from_bytes(hashlib.md5(word.encode("utf-8")).digest()[:4],
                          "little")
    rng = np.random.RandomState(seed)
    return rng.uniform(-1.0, 1.0, size=dim).astype(np.float64)


class _UniversalKeyIndex(object):
    """Membership test used by the reference at common.py:185 — claim
    every word so the OOV random-init branch never runs."""

    def __contains__(self, word):
        return True


class _FakeKeyedVectors(object):
    def __init__(self, dim=FAKE_DIM):
        self.vector_size = dim
        self.key_to_index = _UniversalKeyIndex()

    def __getitem__(self, word):
        return fake_vector(word, self.vector_size)


def load(name):
    if name not in ("glove-wiki-gigaword-300", "word2vec-google-news-300"):
        raise ValueError(f"oracle shim: unknown vector store {name}")
    return _FakeKeyedVectors()
