from fumi_tpu.train.optim import init_optim, linear_warmup_schedule  # noqa: F401
