"""Minimal gensim shim for the oracle harness.

The reference uses gensim for (a) tokenisation + token-id dictionaries
(data.py:14-15) and (b) pretrained word vectors (common.py:5). This shim
reproduces (a) faithfully (see corpora/utils docstrings) and replaces
(b)'s downloadable vector stores with a deterministic fake keyed by word
content (downloader.py) — the SAME fake vectors are exported to the
rebuild's vector-artifact format so both frameworks embed identically.
"""

from . import corpora, utils  # noqa: F401
