from fumi_tpu.utils.profiling import Throughput, profile_trace  # noqa: F401
