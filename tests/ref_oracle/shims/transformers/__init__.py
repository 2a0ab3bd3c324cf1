"""transformers shim for the oracle harness.

The installed transformers (4.57) removed the top-level ``AdamW`` the
reference imports at utils.py:11, which would kill every oracle run at
import time. This shadow provides the four names the reference binds:

- ``AdamW``: torch.optim.AdamW (HF's AdamW was Adam with decoupled
  weight decay — same update as torch's with default correct_bias);
  oracle configs use ``--optim adam`` so this is import-surface only.
- ``get_linear_schedule_with_warmup``: faithful LambdaLR restatement of
  the HF schedule (linear warmup to lr, then linear decay to 0).
- ``BertTokenizer`` / ``BertModel``: fail loudly if used — BERT weights
  need a download this image cannot perform; oracle runs use the
  STANDARD tokenisation path.
"""

from torch.optim import AdamW  # noqa: F401
from torch.optim.lr_scheduler import LambdaLR


def get_linear_schedule_with_warmup(optimizer, num_warmup_steps,
                                    num_training_steps, last_epoch=-1):
    def lr_lambda(current_step):
        if current_step < num_warmup_steps:
            return float(current_step) / float(max(1, num_warmup_steps))
        return max(0.0, float(num_training_steps - current_step) /
                   float(max(1, num_training_steps - num_warmup_steps)))

    return LambdaLR(optimizer, lr_lambda, last_epoch)


class BertTokenizer(object):
    @classmethod
    def from_pretrained(cls, *args, **kwargs):
        raise NotImplementedError(
            "oracle shim: BERT requires a model download")


class BertModel(object):
    @classmethod
    def from_pretrained(cls, *args, **kwargs):
        raise NotImplementedError(
            "oracle shim: BERT requires a model download")
