from transfusion_tpu.models.layers import (
    RMSNorm,
    FeedForward,
    Attention,
    AdaptiveWrapper,
    random_fourier_embed,
)
from transfusion_tpu.models.transformer import Transformer, make_kv_cache
