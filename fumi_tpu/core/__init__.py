from fumi_tpu.core.config import Config, build_parser, config_from_args  # noqa: F401
from fumi_tpu.core.episode import Episode, EpisodeSpec  # noqa: F401
