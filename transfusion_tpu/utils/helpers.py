"""Generic helpers for the TPU-native Transfusion framework.

Capability parity targets (see /root/reference/transfusion_pytorch/transfusion.py):
  - generic helpers             (reference transfusion.py:120-147)
  - char tokenizer for metadata (reference transfusion.py:260-291)
  - sample pretty printing      (reference transfusion.py:220-256)

These are host-side utilities operating on numpy arrays / python lists; nothing
here is traced by JAX.
"""

from __future__ import annotations

import logging
import numpy as np

logger = logging.getLogger("transfusion_tpu")


def exists(v) -> bool:
    return v is not None


def default(v, d):
    return v if v is not None else d


def identity(t, *args, **kwargs):
    return t


def first(it):
    return it[0]


def divisible_by(num, den) -> bool:
    return (num % den) == 0


def cast_tuple(t, length: int = 1) -> tuple:
    return t if isinstance(t, tuple) else ((t,) * length)


def round_up_to_multiple(n: int, mult: int) -> int:
    return ((n + mult - 1) // mult) * mult


# ---------------------------------------------------------------------------
# modality sample structure helpers
#
# A `ModalitySample` is a list of items, each either:
#   - an integer numpy/jax array of token ids (text)
#   - a float array (implicit modality type 0)
#   - a tuple (modality_type: int, float array)
# ---------------------------------------------------------------------------


def is_int_array(t) -> bool:
    return hasattr(t, "dtype") and np.issubdtype(np.asarray(t).dtype, np.integer)


def is_float_array(t) -> bool:
    return hasattr(t, "dtype") and np.issubdtype(np.asarray(t).dtype, np.floating)


def concat_contiguous_text(modality_sample: list) -> list:
    """Merge adjacent integer (text) arrays inside one modality sample.

    Mirrors reference transfusion.py:220-240.
    """
    output: list = []

    for item in modality_sample:
        if (
            len(output) > 0
            and not isinstance(item, tuple)
            and not isinstance(output[-1], tuple)
            and is_int_array(item)
            and is_int_array(output[-1])
        ):
            output[-1] = np.concatenate([np.asarray(output[-1]), np.asarray(item)])
        else:
            output.append(item)

    return output


def print_modality_sample(modality_sample: list) -> list[tuple]:
    """Log a `(kind, shape)` summary of a modality sample.

    Mirrors reference transfusion.py:242-256. Returns the summary for testing.
    """
    output = []

    for item in modality_sample:
        if isinstance(item, tuple):
            modality_type, item = item
            output.append((f"modality:{modality_type}", tuple(np.asarray(item).shape)))
        elif is_int_array(item):
            output.append(("text", tuple(np.asarray(item).shape)))
        else:
            output.append(("modality", tuple(np.asarray(item).shape)))

    print(output)
    return output


# ---------------------------------------------------------------------------
# character-level tokenizer used for the modality shape meta string
# (reference transfusion.py:260-291)
# ---------------------------------------------------------------------------


def char_tokenize(text: str, offset: int = 0) -> np.ndarray:
    return np.array([ord(c) for c in text], dtype=np.int32) + offset


def decode_chars(t, offset: int = 0) -> str:
    byte_list = np.clip(np.asarray(t) - offset, 0, 127).tolist()
    return "".join(map(chr, byte_list))


def tokens_since_rightmost_id(t, rightmost_id: int) -> np.ndarray:
    """Return the tokens strictly after the last occurrence of `rightmost_id`.

    Mirrors reference transfusion.py:275-291 (`get_tokens_since_rightmost_id`).
    Returns an empty array when the id does not occur.
    """
    t = np.asarray(t)
    (hits,) = np.nonzero(t == rightmost_id)

    if hits.size == 0:
        return t[0:0]

    return t[hits[-1] + 1 :]
