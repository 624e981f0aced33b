"""mllm_tpu — a TPU-native (JAX/XLA/Pallas) multimodal LLM inference and
serving framework with the capabilities of yirongjie/mllm.

See SURVEY.md for the reference feature inventory this framework rebuilds.
"""

__version__ = "0.1.0"

from .core.config import TextConfig, from_hf_config
from .core.param_loader import ParamLoader, MultiFileParamLoader, SafetensorsLoader
from .kv.cache import KVCache
from .nn.module import Module, ModuleList
