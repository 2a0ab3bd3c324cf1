from fumi_tpu.data.class_set import ClassSet  # noqa: F401
from fumi_tpu.data.sampler import DeviceEpisodeSampler, HostEpisodeSampler  # noqa: F401
from fumi_tpu.data.synthetic import synthetic_class_set  # noqa: F401
