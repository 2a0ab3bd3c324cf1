"""gensim.corpora.Dictionary shim.

Token-id assignment follows gensim: within each added document, NEW
tokens receive consecutive ids in sorted token order (gensim's doc2bow
sorts the missing-token set before assigning). Only the members the
reference touches are provided: construction from documents,
``add_documents``, ``token2id``, ``__len__`` (the reference reads
``.token2id`` and iterates/indexes THAT dict directly — data.py:344,464,
common.py:14-15 — so the Dictionary object itself needs no item
access)."""


class Dictionary(object):
    def __init__(self, documents=None):
        self.token2id = {}
        if documents is not None:
            self.add_documents(documents)

    def add_documents(self, documents):
        for document in documents:
            tokens = sorted(set(document))
            for token in tokens:
                if token not in self.token2id:
                    self.token2id[token] = len(self.token2id)

    def __len__(self):
        return len(self.token2id)
