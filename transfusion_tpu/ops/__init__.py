from transfusion_tpu.ops.norms import l2norm, rms_norm, softclamp, safe_log
from transfusion_tpu.ops.rope import rope_angles, apply_rope
from transfusion_tpu.ops.flow import (
    noise_data,
    model_output_to_flow,
    min_p_filter,
    gumbel_sample,
)
from transfusion_tpu.ops.odeint import odeint
from transfusion_tpu.ops.spans import (
    sort_spans_by_offset,
    spans_to_instance_mask,
    spans_to_modality_mask,
    spans_to_is_any_modality,
    spans_to_attn_mask,
    spans_to_rotary_positions,
    spans_to_token_times,
)
