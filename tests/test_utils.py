"""Host-utility tests (reference: test/test_utils.py pad_last coverage)."""

import numpy as np

from speech_enhancement_tpu.utils import (
    pad_last,
    sample_fixed_length_data_aligned,
    split_list,
)


def test_pad_last_all_ranks(rng):
    for ndim in range(1, 6):
        shape = tuple([2] * (ndim - 1) + [5])
        x = rng.standard_normal(shape).astype(np.float32)
        out = pad_last(x, 9)
        assert out.shape == shape[:-1] + (9,)
        np.testing.assert_array_equal(out[..., :5], x)
        assert np.all(out[..., 5:] == 0)
        # no-op when already long enough
        assert pad_last(x, 3).shape == shape


def test_split_list_ratios():
    items = list(range(100))
    a, b, c = split_list(items, [0.85, 0.14, 0.01])
    assert len(a) == 85 and len(b) == 14 and len(c) == 1
    assert a + b + c == items


def test_aligned_crop(rng):
    a = rng.standard_normal((1, 100)).astype(np.float32)
    b = a * 2
    ca, cb = sample_fixed_length_data_aligned(a, b, 32, rng)
    assert ca.shape == (1, 32) and cb.shape == (1, 32)
    np.testing.assert_allclose(cb, ca * 2)
    # shorter than crop -> zero-pad
    ca, cb = sample_fixed_length_data_aligned(a[:, :10], b[:, :10], 32, rng)
    assert ca.shape == (1, 32)
    assert np.all(ca[:, 10:] == 0)
