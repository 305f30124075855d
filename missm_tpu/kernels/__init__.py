from .flash_attention import fused_attention
