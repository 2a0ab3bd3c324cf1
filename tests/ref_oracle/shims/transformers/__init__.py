"""transformers shim for the oracle harness.

The installed transformers (4.57) removed the top-level ``AdamW`` the
reference imports at utils.py:11, which would kill every oracle run at
import time; and real BERT weights need a download this image cannot
perform. This shadow provides the four names the reference binds:

- ``AdamW``: torch.optim.AdamW (HF's AdamW was Adam with decoupled
  weight decay — same update as torch's with default correct_bias);
  oracle configs use ``--optim adam`` so this is import-surface only.
- ``get_linear_schedule_with_warmup``: faithful LambdaLR restatement of
  the HF schedule (linear warmup to lr, then linear decay to 0).
- ``BertTokenizer`` / ``BertModel``: DETERMINISTIC fakes (no weights, no
  network) for the oracle's supervised-CLIP runs, which the reference
  hard-wires to BERT (data.py:61-62, 254, 259-281). Semantics:

  * tokenisation is lowercase alphanumeric-run splitting; each token id
    is a pure function of the token string (md5), PAD id is 0 — stable
    across processes, like the gensim shim's ``fake_vector``.
  * the fake encoder's ``last_hidden_state[b, t]`` is a per-token-id
    hash vector SCALED BY ``T / n_real(b)`` on real positions and 0 on
    PAD positions, so the reference's UNMASKED mean pooling over the
    padded length T (``pooling=lambda x: torch.mean(x, dim=1)``,
    data.py:242,275) yields exactly the masked mean of the token
    vectors — i.e. the pooled class embedding is independent of how far
    the batch was padded. That padding-invariance is what lets the
    rebuild-side artifact (computed per description, no padding) be
    numerically identical: the oracle test exports
    ``fake_pooled_embedding`` over all categories into fumi_tpu's
    ``text_embeddings_bert_description.npy`` so both frameworks consume
    the SAME text features.

This module is self-contained over stdlib+numpy(+torch for the classes)
so the rebuild-side test can load it by file path and reuse
``fake_pooled_embedding`` / ``fake_token_ids``.
"""

import hashlib
import re

import numpy as np
from torch.optim import AdamW  # noqa: F401
from torch.optim.lr_scheduler import LambdaLR

FAKE_HIDDEN = 48  # fake BERT hidden size; oracle runs pass
                  # --text_emb_dim 48 (no 768 validation in the
                  # reference parser, utils.py:151-157)
PAD_ID = 0
_MAX_LEN = 512  # truncation=True ceiling (bert-base-uncased)


def get_linear_schedule_with_warmup(optimizer, num_warmup_steps,
                                    num_training_steps, last_epoch=-1):
    def lr_lambda(current_step):
        if current_step < num_warmup_steps:
            return float(current_step) / float(max(1, num_warmup_steps))
        return max(0.0, float(num_training_steps - current_step) /
                   float(max(1, num_training_steps - num_warmup_steps)))

    return LambdaLR(optimizer, lr_lambda, last_epoch)


def fake_token_ids(text):
    """Deterministic token ids for one string (PAD=0 never produced)."""
    words = re.findall(r"[a-z0-9]+", text.lower())[:_MAX_LEN]
    return [1 + int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[:4],
                               "little") % (2 ** 30)
            for w in words]


def fake_token_vector(token_id, dim=FAKE_HIDDEN):
    rng = np.random.RandomState(token_id % (2 ** 31 - 1))
    return rng.uniform(-1.0, 1.0, size=dim).astype(np.float32)


def fake_pooled_embedding(text, dim=FAKE_HIDDEN):
    """Masked mean of the token vectors — EXACTLY what the reference's
    unmasked mean pooling produces through the fake BertModel (see
    module docstring)."""
    ids = fake_token_ids(text)
    if not ids:
        return np.zeros(dim, dtype=np.float32)
    return np.mean([fake_token_vector(i, dim) for i in ids],
                   axis=0, dtype=np.float32)


class BertTokenizer(object):
    """Callable matching the reference's use (data.py:441-449):
    ``tokenizer(texts, return_token_type_ids=False, return_tensors="pt",
    padding=True, truncation=True)`` → {'input_ids', 'attention_mask'}."""

    @classmethod
    def from_pretrained(cls, name, *args, **kwargs):
        return cls()

    def __call__(self, texts, return_token_type_ids=False,
                 return_tensors=None, padding=True, truncation=True):
        import torch
        if isinstance(texts, str):
            texts = [texts]
        seqs = [fake_token_ids(t) for t in texts]
        T = max(1, max(len(s) for s in seqs))
        ids = np.full((len(seqs), T), PAD_ID, dtype=np.int64)
        mask = np.zeros((len(seqs), T), dtype=np.int64)
        for b, s in enumerate(seqs):
            ids[b, :len(s)] = s
            mask[b, :len(s)] = 1
        out = {"input_ids": ids, "attention_mask": mask}
        if return_tensors == "pt":
            out = {k: torch.from_numpy(v) for k, v in out.items()}
        return out


class _FakeBertConfig(object):
    def __init__(self, hidden_size):
        self.hidden_size = hidden_size


class _FakeBertOutput(object):
    def __init__(self, last_hidden_state):
        self.last_hidden_state = last_hidden_state


class BertModel(object):
    """Deterministic stand-in whose unmasked-mean pooling equals the
    masked mean of per-token hash vectors (see module docstring)."""

    def __init__(self, hidden_size=FAKE_HIDDEN):
        self.config = _FakeBertConfig(hidden_size)

    @classmethod
    def from_pretrained(cls, name, *args, **kwargs):
        return cls()

    def to(self, device):
        return self

    def eval(self):
        return self

    def __call__(self, input_ids=None, attention_mask=None,
                 output_attentions=False, **kwargs):
        import torch
        ids = np.asarray(input_ids.cpu() if hasattr(input_ids, "cpu")
                         else input_ids)
        mask = np.asarray(attention_mask.cpu()
                          if hasattr(attention_mask, "cpu")
                          else attention_mask).astype(np.float32)
        B, T = ids.shape
        H = self.config.hidden_size
        hidden = np.zeros((B, T, H), dtype=np.float32)
        n_real = np.maximum(mask.sum(axis=1), 1.0)  # (B,)
        for b in range(B):
            scale = T / n_real[b]
            for t in range(T):
                if mask[b, t]:
                    hidden[b, t] = fake_token_vector(int(ids[b, t]),
                                                     H) * scale
        return _FakeBertOutput(torch.from_numpy(hidden))
