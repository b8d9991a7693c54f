from hmmc_tpu.models.layers import LayerNorm, ResidualAttentionBlock, Transformer
from hmmc_tpu.models.vit import VisionTransformer
from hmmc_tpu.models.text import ClipTextTower, TextEncoder
from hmmc_tpu.models.visual import VisualEncoder
from hmmc_tpu.models.heads import MLMHead, ProjectorMLP

__all__ = [
    "LayerNorm", "ResidualAttentionBlock", "Transformer",
    "VisionTransformer", "ClipTextTower", "TextEncoder", "VisualEncoder",
    "MLMHead", "ProjectorMLP",
]
