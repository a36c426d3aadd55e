"""Mask kit semantics vs the reference (src/utils.py) — hand-checked tables."""

import jax
import jax.numpy as jnp
import numpy as np

from conformer_tpu.models import masks


def ref_subsequent_chunk_mask(size, chunk_size, num_left_chunks):
    """Direct port of the reference loop semantics for testing only."""
    ret = np.zeros((size, size), bool)
    for i in range(size):
        if num_left_chunks < 0:
            start = 0
        else:
            start = max((i // chunk_size - num_left_chunks) * chunk_size, 0)
        ending = min((i // chunk_size + 1) * chunk_size, size)
        ret[i, start:ending] = True
    return ret


def test_make_pad_mask():
    m = masks.make_pad_mask(jnp.array([3, 1, 5]), 5)
    expect = np.array(
        [
            [False, False, False, True, True],
            [False, True, True, True, True],
            [False, False, False, False, False],
        ]
    )
    np.testing.assert_array_equal(np.asarray(m), expect)


def test_subsequent_chunk_mask_matches_reference():
    for size, chunk, left in [(10, 3, -1), (10, 3, 1), (8, 4, 0), (7, 2, 2), (5, 5, -1)]:
        got = np.asarray(masks.subsequent_chunk_mask(size, chunk, left))
        np.testing.assert_array_equal(
            got, ref_subsequent_chunk_mask(size, chunk, left), err_msg=f"{size},{chunk},{left}"
        )


def test_subsequent_chunk_mask_traced_chunk_size():
    f = jax.jit(lambda c: masks.subsequent_chunk_mask(10, c, -1))
    np.testing.assert_array_equal(
        np.asarray(f(jnp.int32(3))), ref_subsequent_chunk_mask(10, 3, -1)
    )


def test_make_attn_mask_padding_only():
    pad = masks.make_non_pad_mask(jnp.array([2, 3]), 3)
    m = masks.make_attn_mask(
        pad,
        use_dynamic_chunk=False,
        use_dynamic_left_chunk=False,
        decoding_chunk_size=0,
        static_chunk_size=-1,
        num_decoding_left_chunks=-1,
    )
    assert m.shape == (2, 3, 3)
    # key-side padding: column t masked iff t >= length
    np.testing.assert_array_equal(np.asarray(m[0, 0]), [True, True, False])
    np.testing.assert_array_equal(np.asarray(m[1, 2]), [True, True, True])


def test_make_attn_mask_dynamic_sampling_bounds():
    pad = masks.make_non_pad_mask(jnp.array([100] * 2), 100)
    for seed in range(5):
        m = masks.make_attn_mask(
            pad,
            use_dynamic_chunk=True,
            use_dynamic_left_chunk=True,
            decoding_chunk_size=0,
            static_chunk_size=-1,
            num_decoding_left_chunks=-1,
            rng=jax.random.PRNGKey(seed),
        )
        assert m.shape == (2, 100, 100)
        got = np.asarray(m[0])
        # row 0 can always see itself
        assert got[0, 0]


def test_sample_dynamic_chunk_range():
    for seed in range(20):
        c, l = masks.sample_dynamic_chunk(jax.random.PRNGKey(seed), 100, True)
        c, l = int(c), int(l)
        assert (1 <= c <= 25) or c == 100
        if c == 100:
            assert l == -1


def test_add_blank():
    t = jnp.array([[1, 2, -1], [3, -1, -1]])
    out = np.asarray(masks.add_blank(t, 0, -1))
    np.testing.assert_array_equal(out, [[0, 1, 2, 0], [0, 3, 0, 0]])


def test_add_sos_eos():
    t = jnp.array([[1, 2, -1]])
    ys_in, ys_out = masks.add_sos_eos(t, jnp.array([2]), 10, 10, -1)
    np.testing.assert_array_equal(np.asarray(ys_in), [[10, 1, 2, 10]])
    np.testing.assert_array_equal(np.asarray(ys_out), [[1, 2, 10, -1]])


def test_reverse_sequence():
    t = jnp.array([[1, 2, 3, -1], [5, -1, -1, -1]])
    out = np.asarray(masks.reverse_sequence(t, jnp.array([3, 1]), -1))
    np.testing.assert_array_equal(out, [[3, 2, 1, -1], [5, -1, -1, -1]])


def test_subsampled_lengths_matches_slicing():
    for t in range(8, 40):
        mask = np.ones((1, t), bool)
        sliced = mask[:, 2::2][:, 2::2]
        assert sliced.shape[1] == masks.subsampled_length(t), t
        np.testing.assert_array_equal(
            int(masks.subsampled_lengths(jnp.array([t]))[0]), sliced.shape[1]
        )
