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


def test_window_integration_gain():
    """Summing window values before decoding recovers messages no single
    window can (correlations add, noise averages down)."""
    from aware_tpu.service.ecc import decode_message_windows, get_code

    code = get_code(8)
    rng = np.random.default_rng(2)
    joint_ok = single_ok = 0
    for _ in range(50):
        msg = rng.integers(0, 2, 8, dtype=np.int32)
        clean = 2.0 * code.encode(msg) - 1.0
        win = (0.35 * clean[None, :]
               + 0.9 * rng.standard_normal((16, 20))).astype(np.float32)
        single_ok += int((code.decode(win[0]).msg_bits == msg).all())
        joint_ok += int(
            (decode_message_windows(win, 8).msg_bits == msg).all()
        )
    assert joint_ok >= 48
    assert joint_ok > single_ok


def test_window_top_selection():
    """top=K sums only the K highest-energy windows — dilution from
    mark-free windows is excluded."""
    from aware_tpu.service.ecc import decode_message_windows, get_code

    code = get_code(6)
    rng = np.random.default_rng(3)
    msg = rng.integers(0, 2, 6, dtype=np.int32)
    clean = 2.0 * code.encode(msg) - 1.0
    marked = 0.9 * clean[None, :] + 0.1 * rng.standard_normal((3, 20))
    empty = 0.4 * rng.standard_normal((30, 20))
    win = np.concatenate([empty[:15], marked, empty[15:]]).astype(np.float32)
    res = decode_message_windows(win, 6, top=3)
    np.testing.assert_array_equal(res.msg_bits, msg)


def test_best_lane_codebook_selector():
    """Lane scoring: the lane holding a (noisy) codeword wins over
    noise-only lanes, and its decode is the embedded message; with a
    high identity margin and only-noise advantage, identity holds."""
    from aware_tpu.service.ecc import _best_lane, get_code

    code = get_code(8)
    rng = np.random.default_rng(4)
    msg = rng.integers(0, 2, 8, dtype=np.int32)
    clean = 2.0 * code.encode(msg) - 1.0
    lanes = 0.45 * rng.standard_normal((5, 20)).astype(np.float32)
    lanes[3] = 0.8 * clean + 0.35 * rng.standard_normal(20)
    best, res = _best_lane(lanes, code, identity_idx=0)
    assert best == 3
    np.testing.assert_array_equal(res.msg_bits, msg)

    # all-noise lanes: a strong identity margin pins the identity lane
    noise = 0.45 * rng.standard_normal((5, 20)).astype(np.float32)
    best, _ = _best_lane(noise, code, identity_idx=0, identity_margin=10.0)
    assert best == 0


def test_invalid_sizes():
    with pytest.raises(ValueError):
        get_code(0)
    with pytest.raises(ValueError):
        get_code(15)
    with pytest.raises(ValueError):
        get_code(8).encode(np.zeros(7))
    with pytest.raises(ValueError):
        get_code(8).decode(np.zeros(19, np.float32))
