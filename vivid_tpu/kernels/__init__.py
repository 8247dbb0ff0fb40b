from .attention import fused_attention
