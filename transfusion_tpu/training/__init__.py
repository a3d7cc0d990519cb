from transfusion_tpu.training.ema import EMA, EmaState, ema_update
from transfusion_tpu.training.optim import (
    adam_atan2,
    muon,
    muon_adam_atan2,
    muon_param_mask,
)
