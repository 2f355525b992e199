"""Soft-decision ECC message layer (service/ecc.py).

Pure-host tests: code construction (Golay shortening), ML decoding
under hard and soft errors, presence p-value behavior.
"""

import numpy as np
import pytest

from aware_tpu.service.ecc import (
    _golay_generator,
    _min_distance,
    decode_message,
    encode_message,
    get_code,
)


def test_extended_golay_distance():
    G = _golay_generator()
    assert G.shape == (12, 24)
    assert _min_distance(G) == 8
    # self-duality sanity: every codeword weight divisible by 4
    msgs = ((np.arange(1, 1 << 12)[:, None] >> np.arange(12)[None, :]) & 1)
    w = ((msgs.astype(np.uint8) @ G) & 1).sum(axis=1)
    assert (w % 4 == 0).all()


@pytest.mark.parametrize("k,d_expect", [(4, 9), (6, 8), (8, 8), (10, 5)])
def test_code_distances(k, d_expect):
    assert get_code(k).d_min >= d_expect


def test_systematic_and_deterministic():
    for k in (3, 6, 8, 11):
        code = get_code(k)
        msg = (np.arange(k) % 2).astype(np.int32)
        slots = code.encode(msg)
        assert slots.shape == (20,)
        np.testing.assert_array_equal(slots[:k], msg)  # systematic
        # same (k, n) -> identical generator across calls
        np.testing.assert_array_equal(code.G, get_code(k).G)


@pytest.mark.parametrize("k", [4, 6, 8])
def test_hard_error_correction(k):
    code = get_code(k)
    t = (code.d_min - 1) // 2
    rng = np.random.default_rng(k)
    for _ in range(50):
        msg = rng.integers(0, 2, k, dtype=np.int32)
        v = (2.0 * code.encode(msg) - 1.0).astype(np.float32)
        flip = rng.choice(20, size=t, replace=False)
        v[flip] *= -1.0
        res = code.decode(v)
        np.testing.assert_array_equal(res.msg_bits, msg)
        assert res.margin > 0


def test_soft_beats_hard():
    """Soft ML fixes a pattern hard-decision decoding cannot: many weak
    wrong slots + confident right slots."""
    code = get_code(8)
    rng = np.random.default_rng(0)
    wins = 0
    for _ in range(100):
        msg = rng.integers(0, 2, 8, dtype=np.int32)
        slots = code.encode(msg)
        clean = 2.0 * slots - 1.0
        v = clean.copy().astype(np.float32)
        # 5 slots (> t=3) pushed barely past zero the wrong way
        flip = rng.choice(20, size=5, replace=False)
        v[flip] = -0.05 * clean[flip]
        res = code.decode(v)
        wins += int((res.msg_bits == msg).all())
    assert wins == 100  # soft reliability makes these trivial


def test_pvalue_separation():
    rng = np.random.default_rng(1)
    null_p, mark_p = [], []
    for i in range(20):
        null_p.append(decode_message(
            rng.standard_normal(20).astype(np.float32) * 0.4, 8).pvalue)
        msg = rng.integers(0, 2, 8)
        v = (2.0 * encode_message(msg) - 1.0).astype(np.float32)
        mark_p.append(decode_message(v, 8).pvalue)
    assert max(mark_p) < 1e-3
    assert np.median(null_p) > 1e-2


def test_encode_message_infers_k():
    msg = np.array([1, 0, 1, 1, 0, 0])
    slots = encode_message(msg)
    res = decode_message((2.0 * slots - 1.0).astype(np.float32), 6)
    np.testing.assert_array_equal(res.msg_bits, msg)
    np.testing.assert_array_equal(res.slot_bits, slots)


def test_invalid_sizes():
    with pytest.raises(ValueError):
        get_code(0)
    with pytest.raises(ValueError):
        get_code(15)
    with pytest.raises(ValueError):
        get_code(8).encode(np.zeros(7))
    with pytest.raises(ValueError):
        get_code(8).decode(np.zeros(19, np.float32))
