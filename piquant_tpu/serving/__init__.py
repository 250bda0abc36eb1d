"""piquant_tpu.serving — continuous-batching inference engine."""

from piquant_tpu.serving.engine import Engine, EngineConfig, Request  # noqa: F401
from piquant_tpu.serving.sampler import SamplingParams, sample  # noqa: F401
from piquant_tpu.serving.server import EngineServer  # noqa: F401
