from fumi_tpu.metalearn.inner_loop import (  # noqa: F401
    maml_episode_loss,
    fumi_episode_loss,
    sgd_inner_update,
)
