from .basic import quick_gelu, get_activation, layer_norm, linear, l2_normalize, dropout
from .attention import multi_head_attention
