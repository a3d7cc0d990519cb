"""transfusion_tpu — TPU-native Transfusion framework (JAX/XLA/Pallas/pjit).

Re-designed from scratch with the full capability surface of
lucidrains/transfusion-pytorch (reference mounted at /root/reference).
"""

__version__ = "0.1.0"

from transfusion_tpu.utils import print_modality_sample  # noqa: F401
