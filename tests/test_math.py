"""Golden-value tests for segment ops, mirroring the reference test style
(``tests/test_math.py`` in PGL asserts hand-computed values)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pgl_tpu import math as gmath


DATA = jnp.asarray([[1.0, 2.0, 3.0], [3.0, 2.0, 1.0], [4.0, 5.0, 6.0]])
SEG = jnp.asarray([0, 0, 1])


def test_segment_sum():
    out = gmath.segment_sum(DATA, SEG, num_segments=2)
    np.testing.assert_allclose(out, [[4, 4, 4], [4, 5, 6]])


def test_segment_mean():
    out = gmath.segment_mean(DATA, SEG, num_segments=2)
    np.testing.assert_allclose(out, [[2, 2, 2], [4, 5, 6]])


def test_segment_max_min():
    out = gmath.segment_max(DATA, SEG, num_segments=2)
    np.testing.assert_allclose(out, [[3, 2, 3], [4, 5, 6]])
    out = gmath.segment_min(DATA, SEG, num_segments=2)
    np.testing.assert_allclose(out, [[1, 2, 1], [4, 5, 6]])


def test_empty_segments_are_zero():
    # Reference contract: nodes with no message -> zeros (pgl/graph.py:806).
    seg = jnp.asarray([0, 0, 3])
    for fn in (gmath.segment_sum, gmath.segment_mean, gmath.segment_max,
               gmath.segment_min):
        out = fn(DATA, seg, num_segments=5)
        np.testing.assert_allclose(out[1], 0.0)
        np.testing.assert_allclose(out[2], 0.0)
        np.testing.assert_allclose(out[4], 0.0)


def test_segment_softmax():
    logits = jnp.asarray([1.0, 2.0, 3.0, 1.0])
    seg = jnp.asarray([0, 0, 1, 1])
    out = gmath.segment_softmax(logits, seg, num_segments=2)
    e = np.exp([1.0, 2.0])
    np.testing.assert_allclose(out[:2], e / e.sum(), rtol=1e-5)
    e = np.exp([3.0, 1.0])
    np.testing.assert_allclose(out[2:], e / e.sum(), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gmath.segment_sum(out, seg, 2)), [1.0, 1.0], rtol=1e-6)


def test_segment_softmax_multidim():
    data = jnp.asarray([[1.0, 4.0], [2.0, 1.0], [3.0, 0.0]])
    seg = jnp.asarray([0, 0, 1])
    out = gmath.segment_softmax(data, seg, num_segments=2)
    col0 = np.exp([1.0, 2.0]); col0 /= col0.sum()
    col1 = np.exp([4.0, 1.0]); col1 /= col1.sum()
    np.testing.assert_allclose(out[:2, 0], col0, rtol=1e-6)
    np.testing.assert_allclose(out[:2, 1], col1, rtol=1e-6)
    np.testing.assert_allclose(out[2], [1.0, 1.0], rtol=1e-6)


def test_segment_padding():
    data = jnp.asarray([[1.0], [2.0], [3.0], [4.0], [5.0]])
    seg = jnp.asarray([0, 0, 0, 1, 1])
    padded, mask, max_len = gmath.segment_padding(data, seg, num_segments=2)
    assert max_len == 3
    np.testing.assert_allclose(padded[0, :, 0], [1, 2, 3])
    np.testing.assert_allclose(padded[1, :, 0], [4, 5, 0])
    np.testing.assert_array_equal(np.asarray(mask),
                                  [[True, True, True], [True, True, False]])


def test_segment_topk_ratio():
    data = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
    score = jnp.asarray([0.1, 0.9, 0.5, 0.3, 0.8, 0.2])
    seg = jnp.asarray([0, 0, 0, 1, 1, 1])
    sel, idx = gmath.segment_topk(data, score, seg, num_segments=2, ratio=0.5)
    # ceil(0.5*3)=2 per segment: top-2 of [0.1,0.9,0.5] -> idx 1,2;
    # top-2 of [0.3,0.8,0.2] -> idx 4,3
    np.testing.assert_array_equal(np.asarray(idx), [1, 2, 3, 4])


def test_segment_topk_min_score():
    data = jnp.arange(6, dtype=jnp.float32).reshape(6, 1)
    score = jnp.asarray([0.1, 0.9, 0.5, 0.3, 0.8, 0.2])
    seg = jnp.asarray([0, 0, 0, 1, 1, 1])
    sel, idx = gmath.segment_topk(data, score, seg, num_segments=2,
                                  min_score=0.4)
    np.testing.assert_array_equal(np.asarray(idx), [1, 2, 4])


def test_jit_compatible():
    import jax

    @jax.jit
    def f(data, seg):
        return gmath.segment_sum(data, seg, num_segments=2)

    np.testing.assert_allclose(f(DATA, SEG), [[4, 4, 4], [4, 5, 6]])


def test_segment_topk_mask_matches_host():
    rng = np.random.default_rng(3)
    score = jnp.asarray(rng.normal(size=50).astype(np.float32))
    seg = jnp.asarray(np.sort(rng.integers(0, 7, 50)).astype(np.int32))
    for ratio in (0.3, 0.5, 1.0):
        _, idx = gmath.segment_topk(score.reshape(-1, 1), score, seg,
                                    num_segments=7, ratio=ratio)
        mask = gmath.segment_topk_mask(score, seg, num_segments=7,
                                       ratio=ratio)
        np.testing.assert_array_equal(np.nonzero(np.asarray(mask))[0],
                                      np.sort(np.asarray(idx)))
    # min_score path
    mask = gmath.segment_topk_mask(score, seg, num_segments=7,
                                   min_score=0.0)
    np.testing.assert_array_equal(np.asarray(mask),
                                  np.asarray(score) > 0.0)


def test_segment_topk_mask_jits():
    import jax

    score = jnp.asarray([0.1, 0.9, 0.5, 0.3, 0.8, 0.2])
    seg = jnp.asarray([0, 0, 0, 1, 1, 1])

    @jax.jit
    def f(score, seg):
        return gmath.segment_topk_mask(score, seg, num_segments=2,
                                       ratio=0.5)

    # ceil(0.5 * 3) = 2 kept per segment
    np.testing.assert_array_equal(np.asarray(f(score, seg)),
                                  [False, True, True, True, True, False])
