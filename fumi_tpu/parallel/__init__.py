from fumi_tpu.parallel.engine import make_parallel_steps  # noqa: F401
