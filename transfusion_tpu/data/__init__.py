from transfusion_tpu.data.packing import (
    PackSpec,
    ModalityPackSpec,
    PackedBatch,
    LatentGroup,
    pack_samples,
    group_same_shape,
    apply_modality_fn,
)
