"""Packer tests: layout invariants that the loss semantics depend on."""

import numpy as np

from transfusion_tpu.data import (
    ModalityPackSpec,
    PackSpec,
    apply_modality_fn,
    group_same_shape,
    pack_samples,
)

N_TEXT = 10


def make_spec(num_modalities=2, channel_first=(False, False), seq_shape_fn=None):
    mods = []
    for i in range(num_modalities):
        mods.append(
            ModalityPackSpec(
                dim_latent=4,
                channel_first=channel_first[i],
                som_id=N_TEXT + 3 + i,
                eom_id=N_TEXT + 3 + num_modalities + i,
                seq_shape_fn=seq_shape_fn or (lambda s: s),
            )
        )
    return PackSpec(
        num_text_tokens=N_TEXT,
        sos_id=N_TEXT,
        eos_id=N_TEXT + 1,
        null_text_id=N_TEXT + 2,
        meta_id=N_TEXT + 3 + 2 * num_modalities,
        char_offset=N_TEXT + 3 + 2 * num_modalities + 1,
        modalities=tuple(mods),
    )


def test_pack_layout_single_modality():
    spec = make_spec()
    samples = [
        [np.array([1, 2, 3]), (0, np.random.randn(2, 4).astype(np.float32))],
    ]
    packed = pack_samples(samples, spec, pad_multiple=8)

    # layout: [sos] 1 2 3 [meta] '2' [som] -1 -1 [eom] [eos]
    meta_char = spec.char_offset + ord("2")
    want = [spec.sos_id, 1, 2, 3, spec.meta_id, meta_char,
            spec.modalities[0].som_id, -1, -1, spec.modalities[0].eom_id,
            spec.eos_id]
    got = packed.text[0, : len(want)].tolist()
    assert got == want
    assert int(packed.lengths[0]) == len(want)
    assert int(packed.total_tokens) == len(want)

    # span covers exactly the interior
    t, off, ln = packed.spans[0, 0]
    assert (t, off, ln) == (0, 7, 2)

    # CFG maskable: sos + user text + eos only
    np.testing.assert_array_equal(
        np.nonzero(packed.cfg_mask[0])[0], [0, 1, 2, 3, len(want) - 1]
    )

    (g,) = packed.groups
    assert g.latents.shape == (1, 2, 4)
    assert g.offsets[0] == 7 and g.batch_idx[0] == 0 and g.span_rows[0] == 0


def test_pack_channel_first_standardized():
    spec = make_spec(channel_first=(True, False))
    x = np.random.randn(4, 3, 2).astype(np.float32)  # [c, h, w]
    packed = pack_samples([[x]], spec, pad_multiple=8)
    (g,) = packed.groups
    assert g.latents.shape == (1, 3, 2, 4)  # channel-last
    assert g.latent_shape == (3, 2)
    np.testing.assert_allclose(g.latents[0], np.moveaxis(x, 0, -1))


def test_pack_groups_same_shape_batched():
    spec = make_spec()
    a = np.random.randn(2, 4).astype(np.float32)
    b = np.random.randn(2, 4).astype(np.float32)
    c = np.random.randn(5, 4).astype(np.float32)
    samples = [
        [np.array([1]), (0, a), (1, c)],
        [(0, b), np.array([2, 3])],
    ]
    packed = pack_samples(samples, spec, pad_multiple=8)
    assert len(packed.groups) == 2  # (0,(2,)) and (1,(5,))
    g0, g1 = packed.groups
    assert g0.modality_type == 0 and g0.k == 2
    assert g1.modality_type == 1 and g1.k == 1
    np.testing.assert_array_equal(g0.batch_idx, [0, 1])

    # spans sorted by construction; second sample has one span
    assert (packed.spans[:, :, 2] > 0).sum() == 3


def test_pack_downsampling_seq_shape():
    spec = make_spec(seq_shape_fn=lambda s: tuple(d // 2 for d in s))
    x = np.random.randn(4, 4, 4).astype(np.float32)  # [h, w, c]
    packed = pack_samples([[x]], spec, pad_multiple=8)
    (g,) = packed.groups
    assert g.seq_shape == (2, 2)
    t, off, ln = packed.spans[0, 0]
    assert ln == 4  # downsampled token count in the sequence
    # meta string still records the LATENT shape (4,4)
    chars = [spec.char_offset + ord(ch) for ch in "4,4"]
    np.testing.assert_array_equal(packed.text[0, 2 : 2 + 3], chars)


def test_pack_zero_dimensional():
    spec = make_spec()
    packed = pack_samples([[np.random.randn(4).astype(np.float32)]], spec,
                          pad_multiple=8)
    (g,) = packed.groups
    assert g.latent_shape == () and g.seq_len == 1
    # frame: [sos][meta][som] -1 [eom][eos]  (empty shape string)
    t, off, ln = packed.spans[0, 0]
    assert ln == 1 and off == 3


def test_pack_no_meta_mode():
    spec = make_spec()
    samples = [[np.array([1, 2]), (0, np.random.randn(3, 4).astype(np.float32))]]
    packed = pack_samples(samples, spec, wrap_sos_eos=False, add_meta=False,
                          pad_multiple=8)
    want = [1, 2, -1, -1, -1]
    assert packed.text[0, :5].tolist() == want
    t, off, ln = packed.spans[0, 0]
    assert (off, ln) == (2, 3)


def test_group_same_shape_roundtrip():
    data = [np.full((3, 5), i, np.float32) for i in range(2)]
    data += [np.full((2, 3), 9, np.float32)]
    stacked, inverse = group_same_shape(data)
    out = inverse({k: v + 1 for k, v in stacked.items()})
    for orig, new in zip(data, out):
        np.testing.assert_allclose(new, orig + 1)


def test_apply_modality_fn():
    mods = [
        [np.zeros((3, 5), np.float32)],
        [np.zeros((1, 5), np.float32)],
        [(1, np.zeros((3, 5), np.float32))],
        [(1, np.zeros((2, 5), np.float32))],
        [(0, np.zeros((1, 5), np.float32)), (1, np.zeros((3, 5), np.float32))],
    ]
    out = apply_modality_fn(lambda x: x + 1, mods, modality_type=0)
    out = apply_modality_fn(lambda x: x + 2, out, modality_type=1)
    assert (out[0][0][1] == 1).all()
    assert (out[2][0][1] == 2).all()
    assert (out[4][0][1] == 1).all() and (out[4][1][1] == 2).all()


def test_native_assembly_matches_numpy():
    """csrc/fastpack.cpp must be semantically identical to the numpy path."""
    import pytest

    from transfusion_tpu.data import packing

    if packing._fastpack is None:
        pytest.skip("native extension not built")

    spec = make_spec()
    rng = np.random.default_rng(0)
    samples = []
    for i in range(8):
        s = [rng.integers(0, 10, 3 + i).astype(np.int32)]
        if i % 2 == 0:
            s.append((0, rng.standard_normal((2 + i, 4)).astype(np.float32)))
        if i % 3 == 0:
            s.append((1, rng.standard_normal((1 + i, 4)).astype(np.float32)))
        samples.append(s)

    for kw in (dict(), dict(wrap_sos_eos=False, add_meta=False)):
        a = pack_samples(samples, spec, use_native=True, **kw)
        b = pack_samples(samples, spec, use_native=False, **kw)
        np.testing.assert_array_equal(a.text, b.text)
        np.testing.assert_array_equal(a.cfg_mask, b.cfg_mask)
        np.testing.assert_array_equal(a.spans, b.spans)
        np.testing.assert_array_equal(a.lengths, b.lengths)


def test_packer_fuzz_invariants():
    """Random ragged batches: structural invariants always hold."""
    rng = np.random.default_rng(7)
    spec = make_spec()

    for trial in range(20):
        samples = []
        for _ in range(rng.integers(1, 5)):
            items = []
            for _ in range(rng.integers(1, 6)):
                if rng.random() < 0.5:
                    items.append(rng.integers(0, 10, rng.integers(1, 20)).astype(np.int32))
                else:
                    t = int(rng.integers(0, 2))
                    shape = tuple(rng.integers(1, 5, rng.integers(0, 3)))
                    items.append((t, rng.standard_normal((*shape, 4)).astype(np.float32)))
            samples.append(items)

        packed = pack_samples(samples, spec, pad_multiple=8)
        b, n = packed.text.shape

        assert (packed.lengths <= n).all()
        # spans inside true lengths; interiors are -1; cfg mask off in spans
        for bi in range(b):
            for t, off, ln in packed.spans[bi]:
                if ln <= 0:
                    continue
                assert off + ln <= packed.lengths[bi]
                assert (packed.text[bi, off : off + ln] == -1).all()
                assert not packed.cfg_mask[bi, off : off + ln].any()
        # every instance row maps back into its span interior
        n_inst = sum(
            1 for s in samples for it in s
            if isinstance(it, tuple) or (
                hasattr(it, "dtype") and np.issubdtype(np.asarray(it).dtype, np.floating))
        )
        assert sum(g.k for g in packed.groups) == n_inst
        for g in packed.groups:
            for r in range(g.k):
                bi, off = int(g.batch_idx[r]), int(g.offsets[r])
                t, o, ln = packed.spans[bi, int(g.span_rows[r])]
                assert o == off and ln == g.seq_len and t == g.modality_type
        assert int(packed.total_tokens) == int(packed.lengths.sum())
