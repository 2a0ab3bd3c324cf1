"""gensim.corpora.Dictionary shim.

Token-id assignment follows gensim: within each added document, NEW
tokens receive consecutive ids in sorted token order (gensim's doc2bow
sorts the missing-token set before assigning). Only the members the
reference touches are provided: construction from documents,
``add_documents``, ``token2id``, ``items()``/``__len__``/``__getitem__``
via token2id (models index the returned token2id dict directly,
data.py:344, common.py:15)."""


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
