from fumi_tpu.ops.fewshot import (  # noqa: F401
    get_num_samples,
    get_prototypes,
    pairwise_sqdist,
    prototype_logits,
    prototypical_loss,
    predict_classes,
)
from fumi_tpu.ops.metrics import (  # noqa: F401
    accuracy,
    confusion_matrix,
    macro_prf1,
    episode_metrics,
)
