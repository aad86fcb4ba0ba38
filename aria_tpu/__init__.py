"""aria-tpu: a TPU-native multimodal MoE framework (JAX/XLA/Pallas).

From-scratch rebuild of the capabilities of rhymes-ai/Aria: SigLIP-style ViT ->
cross-attention projector -> 25.3B-total / 3.9B-active top-6-of-64 MoE decoder,
with variable-resolution image processing, a jitted KV-cache serving engine,
and mesh-parallel (fsdp/expert/model/context) fine-tuning.
"""

from aria_tpu.config import AriaConfig, ProjectorConfig, TextConfig, VisionConfig

__all__ = ["AriaConfig", "ProjectorConfig", "TextConfig", "VisionConfig"]
__version__ = "0.1.0"
