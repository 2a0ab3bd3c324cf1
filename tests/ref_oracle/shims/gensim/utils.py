"""gensim.utils.tokenize shim: yields maximal alphabetic runs, matching
gensim's PAT_ALPHABETIC = [^\\W\\d_]+ with no lowercasing by default
(the reference relies on '<PAD>' tokenising to 'PAD', data.py:457-466)."""

import re

_PAT_ALPHABETIC = re.compile(r"[^\W\d_]+", re.UNICODE)


def tokenize(text, lowercase=False, deacc=False, errors="strict",
             to_lower=False, lower=False):
    if lowercase or to_lower or lower:
        text = text.lower()
    for match in _PAT_ALPHABETIC.finditer(text):
        yield match.group()
