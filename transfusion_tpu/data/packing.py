"""Host-side packing: ragged multimodal samples -> static-shape device buffers.

This layer is the TPU-native inversion of the reference's per-step Python
assembly loop (reference transfusion.py:2486-2656), which rebuilds padded
tensors and per-modality closures on the host every training step. Here the
ragged structure is folded once into a `PackedBatch`:

  text        Int[b, n]     token ids; -1 at modality interiors and padding
  cfg_mask    Bool[b, n]    positions replaced by null_text_id under CFG dropout
  spans       Int[b, m, 3]  (modality_type, offset, length) per instance
  groups      per (type, latent-shape) batches of clean latents + scatter
              indices — every device-side op is a static-shape gather/scatter

so a single jitted train step covers every batch with the same bucket
signature (padded length, span count, group shapes).

Token-id layout (must match reference transfusion.py:1388-1415):
  text ids 0..N-1; sos=N; eos=N+1; null=N+2;
  som_ids = N+3 .. N+3+M-1; eom_ids = N+3+M .. N+3+2M-1;
  meta_id = N+3+2M; char meta tokens meta_id+1 .. meta_id+128.

Sequence layout per modality instance (training, reference :2586-2605):
  [meta_id][shape chars][som] <interior: length L, text=-1> [eom]

Deviations from the reference (deliberate, documented):
  * The shape string encodes the modality's *latent* spatial shape. The
    reference writes the post-`latent_to_model` shape (transfusion.py:2577),
    which disagrees with what `sample()` needs to create noise when the
    projection downsamples (pre_post_transformer_enc_dec); writing the latent
    shape makes sample()+unet self-consistent. For the default (identity /
    linear) projections the two are identical.
  * Latents are standardized to channel-LAST internally regardless of
    `channel_first_latent` (which only describes the user-facing layout);
    flax convs are channel-last, and one internal layout kills a class of
    transposition bugs. Inputs/outputs are converted at the boundary.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Optional, Sequence

import flax.struct
import numpy as np

from transfusion_tpu.utils.helpers import (
    char_tokenize,
    is_int_array,
    round_up_to_multiple,
)


# ---------------------------------------------------------------------------
# specs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ModalityPackSpec:
    dim_latent: int
    channel_first: bool = False
    num_dim: Optional[int] = None
    som_id: int = 0
    eom_id: int = 0
    # latent spatial shape -> sequence (post latent_to_model) spatial shape
    seq_shape_fn: Callable[[tuple], tuple] = lambda s: s


@dataclasses.dataclass(frozen=True)
class PackSpec:
    num_text_tokens: int
    sos_id: int
    eos_id: int
    null_text_id: int
    meta_id: int
    char_offset: int  # meta_id + 1
    modalities: tuple[ModalityPackSpec, ...]


# ---------------------------------------------------------------------------
# packed structures (pytrees; static metadata lives in aux data)
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class LatentGroup:
    latents: Any  # f32[k, *latent_shape, dim_latent] — clean, channel-last
    batch_idx: Any  # i32[k]
    offsets: Any  # i32[k] — sequence offset of interior start
    span_rows: Any  # i32[k] — row into spans / times
    modality_type: int = flax.struct.field(pytree_node=False)
    latent_shape: tuple = flax.struct.field(pytree_node=False)
    seq_shape: tuple = flax.struct.field(pytree_node=False)

    @property
    def k(self):
        return self.latents.shape[0]

    @property
    def seq_len(self):
        return int(math.prod(self.seq_shape))


@flax.struct.dataclass
class PackedBatch:
    text: Any  # i32[b, n]
    cfg_mask: Any  # bool[b, n]
    spans: Any  # i32[b, m, 3]
    lengths: Any  # i32[b] true (unpadded) lengths
    total_tokens: Any  # i32[] == lengths.sum()
    groups: tuple  # tuple[LatentGroup, ...] sorted by (type, shape)

    @property
    def batch(self):
        return self.text.shape[0]

    @property
    def seq_len(self):
        return self.text.shape[1]


# ---------------------------------------------------------------------------
# sample normalization helpers
# ---------------------------------------------------------------------------


def to_channel_last(x: np.ndarray, channel_first: bool) -> np.ndarray:
    if channel_first and x.ndim > 1:
        return np.moveaxis(x, 0, -1)
    return x


def to_user_layout(x: np.ndarray, channel_first: bool) -> np.ndarray:
    if channel_first and x.ndim > 1:
        return np.moveaxis(x, -1, 0)
    return x


def normalize_sample(sample) -> list:
    """Standardize a ModalitySample: float arrays -> (0, arr) tuples, 0-d int
    arrays -> 1-d. Mirrors reference transfusion.py:2388-2403."""
    out = []
    for item in sample:
        if isinstance(item, tuple):
            mtype, arr = item
            out.append((int(mtype), np.asarray(arr)))
            continue
        arr = np.asarray(item)
        if np.issubdtype(arr.dtype, np.floating):
            out.append((0, arr))
        else:
            if arr.ndim == 0:
                arr = arr[None]
            out.append(arr.astype(np.int32))
    return out


# ---------------------------------------------------------------------------
# the packer
# ---------------------------------------------------------------------------


try:  # native C++ assembly (csrc/fastpack.cpp); numpy fallback below
    from transfusion_tpu import _fastpack  # type: ignore
except Exception:  # pragma: no cover
    _fastpack = None


def _assemble_numpy(descriptors, n: int, m: int):
    """Pure-numpy equivalent of _fastpack.pack_batch (semantics tested equal)."""
    batch = len(descriptors)
    text = np.full((batch, n), -1, np.int32)
    cfg = np.zeros((batch, n), bool)
    spans = np.zeros((batch, m, 3), np.int32)
    lengths = np.zeros(batch, np.int32)

    for b, items in enumerate(descriptors):
        off = 0
        si = 0
        for item in items:
            if item[0] == "t":
                _, ids, maskable = item
                ln = len(ids)
                text[b, off : off + ln] = ids
                if maskable:
                    cfg[b, off : off + ln] = True
                off += ln
            else:
                _, mtype, head, interior, eom = item
                hl = len(head)
                text[b, off : off + hl] = head
                spans[b, si] = (mtype, off + hl, interior)
                si += 1
                off += hl + interior
                if eom >= 0:
                    text[b, off] = eom
                    off += 1
        lengths[b] = off
    return text, cfg, spans, lengths


def pack_samples(
    samples: Sequence[list],
    spec: PackSpec,
    *,
    wrap_sos_eos: bool = True,
    add_meta: bool = True,
    pad_multiple: int = 64,
    pad_len: Optional[int] = None,
    span_multiple: int = 2,
    use_native: bool = True,
    shift_friendly: bool = False,
) -> PackedBatch:
    """Pack a list of ragged ModalitySamples into one PackedBatch.

    `samples` items are lists of int arrays (text) / float arrays (implicit
    type 0) / (type, float array) tuples — latents must already be encoded
    (use `Transfusion.encode_modalities` first when modality encoders exist).

    wrap_sos_eos: add [sos] ... [eos] (training; reference :2341-2349).
    add_meta: write the [meta][shape][som] ... [eom] frame around each
        modality (training / prompts). Sampling forwards pass False because
        the sampled text stream already contains the frame.

    Buffer assembly runs in the native C++ extension when built
    (csrc/fastpack.cpp); set use_native=False to force the numpy path.

    shift_friendly pads to multiple+1 so that after the next-token shift the
    model consumes a tile-aligned sequence (required by the Pallas flash
    path, and friendlier to the MXU generally).
    """
    batch = len(samples)
    num_modalities = len(spec.modalities)

    descriptors: list[list] = []
    all_span_counts: list[int] = []
    instances: list[dict] = []  # modality instances across the batch
    lengths_py: list[int] = []

    for b, sample in enumerate(samples):
        sample = normalize_sample(sample)

        if wrap_sos_eos:
            sample = [
                np.array([spec.sos_id], np.int32),
                *sample,
                np.array([spec.eos_id], np.int32),
            ]

        items: list = []
        offset = 0
        span_count = 0

        for item in sample:
            if is_int_array(item) and not isinstance(item, tuple):
                ids = np.ascontiguousarray(np.asarray(item, np.int32))
                items.append(("t", ids, 1))
                offset += len(ids)
                continue

            mtype, latent = item
            assert 0 <= mtype < num_modalities, (
                f"modality type {mtype} out of range ({num_modalities} modalities)"
            )
            mspec = spec.modalities[mtype]

            latent = np.asarray(latent, np.float32)
            channel_axis = 0 if mspec.channel_first and latent.ndim > 1 else -1
            assert latent.shape[channel_axis] == mspec.dim_latent, (
                f"modality {mtype}: expected latent dim {mspec.dim_latent}, got "
                f"shape {latent.shape} (channel_first={mspec.channel_first})"
            )
            latent = to_channel_last(latent, mspec.channel_first)
            spatial = tuple(latent.shape[:-1])
            if mspec.num_dim is not None:
                assert len(spatial) == mspec.num_dim, (
                    f"modality {mtype}: expected {mspec.num_dim} spatial dims, "
                    f"got shape {spatial}"
                )

            seq_shape = tuple(mspec.seq_shape_fn(spatial))
            length = int(math.prod(seq_shape))

            if add_meta:
                shape_str = ",".join(map(str, spatial))
                meta_chars = char_tokenize(shape_str, offset=spec.char_offset)
                head = np.concatenate(
                    [
                        np.array([spec.meta_id], np.int32),
                        meta_chars.astype(np.int32),
                        np.array([mspec.som_id], np.int32),
                    ]
                )
                eom = mspec.eom_id
            else:
                head = np.zeros(0, np.int32)
                eom = -1

            head = np.ascontiguousarray(head)
            start = offset + len(head)
            items.append(("m", mtype, head, length, eom))
            instances.append(
                dict(
                    batch=b,
                    span_row=span_count,
                    mtype=mtype,
                    latent=latent,
                    spatial=spatial,
                    seq_shape=seq_shape,
                    offset=start,
                )
            )
            span_count += 1
            offset = start + length + (1 if add_meta else 0)

        descriptors.append(items)
        all_span_counts.append(span_count)
        lengths_py.append(offset)

    max_len = max(lengths_py) if lengths_py else 1
    n = pad_len if pad_len is not None else round_up_to_multiple(
        max(max_len, 1) + 1, pad_multiple
    ) + (1 if shift_friendly else 0)
    # shift_friendly packs for the training path's text[:, :-1] shift — an
    # exact-fit pad there would silently truncate the last real token of
    # max-length samples (and drop span tails out of the scatter)
    min_n = max_len + (1 if shift_friendly else 0)
    assert n >= min_n, (
        f"pad_len {n} too small for longest sample {max_len}"
        + (" + 1 shift slot (shift_friendly=True)" if shift_friendly else "")
    )

    m = max(
        span_multiple,
        round_up_to_multiple(max(all_span_counts, default=1), span_multiple),
    )

    if use_native and _fastpack is not None:
        text, cfg, spans_arr, lengths = _fastpack.pack_batch(descriptors, n, m)
        cfg = cfg.astype(bool)
    else:
        text, cfg, spans_arr, lengths = _assemble_numpy(descriptors, n, m)

    # group instances by (type, latent spatial shape), deterministic order
    group_key = lambda inst: (inst["mtype"], inst["spatial"])
    keys = sorted({group_key(i) for i in instances})
    groups = []
    for key in keys:
        members = [i for i in instances if group_key(i) == key]
        mtype, spatial = key
        groups.append(
            LatentGroup(
                latents=np.stack([i["latent"] for i in members]),
                batch_idx=np.array([i["batch"] for i in members], np.int32),
                offsets=np.array([i["offset"] for i in members], np.int32),
                span_rows=np.array([i["span_row"] for i in members], np.int32),
                modality_type=mtype,
                latent_shape=spatial,
                seq_shape=members[0]["seq_shape"],
            )
        )

    return PackedBatch(
        text=text,
        cfg_mask=cfg,
        spans=spans_arr,
        lengths=lengths,
        total_tokens=np.int32(lengths.sum()),
        groups=tuple(groups),
    )


# ---------------------------------------------------------------------------
# batched application of encoders/decoders over ragged samples
# (capability of reference transfusion.py:517-625: stack_same_shape_tensors,
#  filter_with_inverse, apply_fn_modality_type)
# ---------------------------------------------------------------------------


def group_same_shape(tensors: list[np.ndarray]):
    """Group same-shape arrays into stacked batches with an exact-order
    inverse. Returns ({shape: stacked}, inverse_fn)."""
    by_shape: dict[tuple, list] = {}
    index: list[tuple[tuple, int]] = []

    for t in tensors:
        shape = tuple(np.asarray(t).shape)
        bucket = by_shape.setdefault(shape, [])
        index.append((shape, len(bucket)))
        bucket.append(np.asarray(t))

    stacked = {shape: np.stack(ts) for shape, ts in by_shape.items()}

    def inverse(processed: dict):
        assert {s: len(v) for s, v in processed.items()} == {
            s: len(v) for s, v in by_shape.items()
        }
        return [np.asarray(processed[shape])[i] for shape, i in index]

    return stacked, inverse


def apply_modality_fn(
    fn: Callable,
    samples,
    modality_type: int = 0,
    return_untransformed: bool = False,
):
    """Apply a batched `fn` to every modality of `modality_type` across
    nested ModalitySamples, batching same-shape instances together.

    `samples` is a ModalitySample or list of them. Float arrays without a
    type tuple are treated as type 0. Preserves structure and order.
    """
    single = len(samples) > 0 and not isinstance(samples[0], list)
    nested = [samples] if single else samples

    located: list[tuple[int, int, np.ndarray]] = []
    for si, sample in enumerate(nested):
        for ii, item in enumerate(sample):
            if isinstance(item, tuple):
                t, arr = item
            else:
                # np.asarray FIRST: plain Python float lists are legal
                # modality items everywhere else (pack_samples asarray's
                # them), so the encoder must see them too
                arr_np = np.asarray(item)
                if not np.issubdtype(arr_np.dtype, np.floating):
                    continue
                t, arr = 0, arr_np
            if t == modality_type:
                located.append((si, ii, np.asarray(arr)))

    stacked, inverse = group_same_shape([arr for _, _, arr in located])
    processed = {shape: np.asarray(fn(batch)) for shape, batch in stacked.items()}
    results = inverse(processed)

    out = [list(s) for s in nested]
    for (si, ii, prev), res in zip(located, results):
        if return_untransformed:
            out[si][ii] = (modality_type, res, prev)
        else:
            out[si][ii] = (modality_type, res)

    return out[0] if single else out
