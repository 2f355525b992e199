"""Detector net parity vs the torch oracle.

Covers: key-bundle extraction order (the golden npz must equal the weights a
full torch module tree produces under the seed), forward-pass parity on
random magnitudes, and the full waveform->values detection pipeline.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from aware_tpu.config import DetectorNetConfig
from aware_tpu.models import (
    detect_values,
    detector_apply,
    detector_apply_batch,
    init_params,
    load_key_params,
    model_info,
)
from tests.oracles.torch_ref import OracleDetectorNet, oracle_detect_values


@pytest.fixture(scope="module")
def oracle_net():
    return OracleDetectorNet().eval()


@pytest.fixture(scope="module")
def key_params():
    return load_key_params()


def test_key_bundle_matches_module_tree_init(oracle_net, key_params):
    """The extraction script draws RNG in the same order as Module.apply."""
    for i, block in enumerate(oracle_net.conv_blocks):
        w = block.conv.weight.detach().squeeze(-1).numpy()
        b = block.conv.bias.detach().numpy()
        np.testing.assert_array_equal(key_params[f"conv{i}_w"], w)
        np.testing.assert_array_equal(key_params[f"conv{i}_b"], b)


def test_init_params_returns_key_for_default_cfg(key_params):
    params = init_params(DetectorNetConfig())
    np.testing.assert_array_equal(params["conv0_w"], key_params["conv0_w"])


def test_init_params_nondefault_cfg_is_deterministic():
    cfg = DetectorNetConfig(seed=7, n_filters=(64, 64, 64))
    a = init_params(cfg)
    b = init_params(cfg)
    np.testing.assert_array_equal(a["conv1_w"], b["conv1_w"])
    assert a["conv0_w"].shape == (64, 128)
    assert a["conv3_w"].shape == (40, 64)


@pytest.mark.parametrize("t_frames", [40, 127])
def test_forward_parity_random_magnitude(oracle_net, key_params, rng, t_frames):
    mag = (rng.random((513, t_frames)) * 3.0).astype(np.float32)
    ref = oracle_net(torch.from_numpy(mag).unsqueeze(0)).detach().squeeze().numpy()
    ours = np.asarray(detector_apply(key_params, jnp.asarray(mag)))
    assert ours.shape == ref.shape == (20,)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_forward_parity_banded_magnitude(oracle_net, key_params, rng):
    """Out-of-band-zeroed input — the real detection-time distribution."""
    mag = np.zeros((513, 80), np.float32)
    mag[32:257] = (rng.random((225, 80)) * 2.0).astype(np.float32)
    ref = oracle_net(torch.from_numpy(mag).unsqueeze(0)).detach().squeeze().numpy()
    ours = np.asarray(detector_apply(key_params, jnp.asarray(mag)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_batch_apply_matches_per_clip(key_params, rng):
    mags = (rng.random((4, 513, 30))).astype(np.float32)
    batched = np.asarray(detector_apply_batch(key_params, jnp.asarray(mags)))
    for i in range(4):
        single = np.asarray(detector_apply(key_params, jnp.asarray(mags[i])))
        np.testing.assert_allclose(batched[i], single, atol=1e-6)


def test_detect_values_pipeline_parity(oracle_net, key_params, speechlike):
    ref = oracle_detect_values(oracle_net, speechlike)
    ours = np.asarray(detect_values(key_params, jnp.asarray(speechlike)))
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-3)
    # Bit decisions must agree exactly.
    np.testing.assert_array_equal(ours > 0, ref > 0)


def test_model_info(key_params):
    info = model_info(key_params, DetectorNetConfig())
    assert info["total_parameters"] == 1_681_960
    assert info["output_length"] == 20
