"""Multi-chip sharding tests on the fake 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aware_tpu.config import AwareConfig
from aware_tpu.embed import embed_batch
from aware_tpu.models import detect_values, init_params
from aware_tpu.parallel import (
    get_mesh,
    sharded_detect_batch,
    sharded_embed_batch,
    streaming_detect_values,
)

pytestmark = pytest.mark.multichip


@pytest.fixture(scope="module")
def params():
    return init_params(AwareConfig().detection_net)


@pytest.fixture(scope="module")
def cfg():
    return AwareConfig()


def test_mesh_has_8_devices():
    mesh = get_mesh(("data",))
    assert mesh.shape["data"] == 8


def test_sharded_detect_matches_local(params, cfg, speechlike):
    mesh = get_mesh(("data",))
    audios = np.stack([np.roll(speechlike, 137 * i) for i in range(8)])
    out = np.asarray(sharded_detect_batch(params, audios, cfg, mesh))
    assert out.shape == (8, 20)
    for i in (0, 3, 7):
        local = np.asarray(detect_values(params, jnp.asarray(audios[i])))
        np.testing.assert_allclose(out[i], local, atol=1e-4, rtol=1e-3)


def test_sharded_embed_runs_and_detects(params, speechlike):
    cfg = AwareConfig().replace(num_iterations=12)
    mesh = get_mesh(("data",))
    audios = np.stack([np.roll(speechlike, 311 * i) for i in range(8)])
    wms = np.stack(
        [(np.arange(20) % 2 == (i % 2)).astype(np.float32) * 2 - 1 for i in range(8)]
    )
    res = sharded_embed_batch(params, audios, wms, cfg, mesh)
    audio_out = np.asarray(res.audio)
    assert audio_out.shape == (8, 32000)
    assert np.all(np.isfinite(audio_out))
    # losses decreased from the unoptimized start for every clip
    assert np.all(np.asarray(res.best_loss) <= np.asarray(res.final_loss) + 1e-6)


def test_sharded_embed_batch_size_validation(params, speechlike):
    cfg = AwareConfig().replace(num_iterations=2)
    mesh = get_mesh(("data",))
    with pytest.raises(ValueError, match="divisible"):
        sharded_embed_batch(
            params,
            np.stack([speechlike] * 3),
            np.ones((3, 20), np.float32),
            cfg,
            mesh,
        )


@pytest.mark.parametrize("length", [32000, 31871, 160000])
def test_streaming_detect_matches_single_device(params, cfg, speechlike, length):
    """Sequence-parallel detection == single-device detection, including
    ragged lengths whose frame counts don't divide the mesh."""
    mesh = get_mesh(("seq",))
    reps = int(np.ceil(length / len(speechlike)))
    audio = np.tile(speechlike, reps)[:length].astype(np.float32)
    ours = np.asarray(streaming_detect_values(params, audio, cfg, mesh))
    ref = np.asarray(detect_values(params, jnp.asarray(audio)))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)
    np.testing.assert_array_equal(ours > 0, ref > 0)


def test_streaming_detect_long_form(params, cfg, speechlike):
    """A 40 s clip (beyond anything the tests embed) detects fine sharded."""
    mesh = get_mesh(("seq",))
    audio = np.tile(speechlike, 20).astype(np.float32)
    out = np.asarray(streaming_detect_values(params, audio, cfg, mesh))
    assert out.shape == (20,)
    assert np.all(np.isfinite(out))


def test_two_axis_mesh(params, cfg, speechlike):
    """(data=2, seq=4) factorized mesh: batched streaming detection."""
    mesh = get_mesh(("data", "seq"), shape=(2, 4))
    out = np.stack(
        [
            streaming_detect_values(params, speechlike, cfg, mesh, axis="seq"),
            streaming_detect_values(
                params, np.roll(speechlike, 97), cfg, mesh, axis="seq"
            ),
        ]
    )
    assert out.shape == (2, 20)
    ref = np.asarray(detect_values(params, jnp.asarray(speechlike)))
    np.testing.assert_allclose(out[0], ref, atol=1e-4, rtol=1e-3)
