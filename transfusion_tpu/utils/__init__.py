from transfusion_tpu.utils.helpers import (
    exists,
    default,
    identity,
    first,
    divisible_by,
    cast_tuple,
    round_up_to_multiple,
    char_tokenize,
    decode_chars,
    tokens_since_rightmost_id,
    concat_contiguous_text,
    print_modality_sample,
)
