from mre_tpu.core.config import Config
from mre_tpu.core.rng import RngStream
