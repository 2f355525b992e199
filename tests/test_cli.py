"""CLI surface (python -m aware_tpu): the round-5b message/one-shot
modes, end-to-end through WAV files on the CPU backend.

The solver-path embed subcommand is exercised implicitly by the chip
tier and service tests; here the fast paths keep the suite cheap."""

import json

import numpy as np
import pytest

from aware_tpu.__main__ import main
from aware_tpu.utils.io import read_wav, write_wav


@pytest.fixture(scope="module")
def wav_in(tmp_path_factory):
    from aware_tpu.eval import synthesize_speech_clip

    p = tmp_path_factory.mktemp("cli") / "in.wav"
    write_wav(str(p), synthesize_speech_clip(900), 16000)
    return str(p)


def test_cli_oneshot_message_roundtrip(wav_in, tmp_path, capsys):
    out = str(tmp_path / "marked.wav")
    main(["embed", wav_in, out, "--message", "10110101", "--oneshot"])
    audio, sr = read_wav(out)
    assert sr == 16000 and len(audio) > 0
    capsys.readouterr()
    main(["detect", out, "--message-k", "8"])
    res = json.loads(capsys.readouterr().out)
    assert res["message"] == "10110101"
    assert 0.0 <= res["pvalue"] <= 1.0


def test_cli_detect_robust_message_identity_guard(wav_in, tmp_path, capsys):
    out = str(tmp_path / "marked.wav")
    main(["embed", wav_in, out, "--message", "1011", "--oneshot"])
    capsys.readouterr()
    main(["detect", out, "--message-k", "4", "--robust",
          "--identity-margin", "1.9"])
    res = json.loads(capsys.readouterr().out)
    assert res["message"] == "1011"
    # weak one-shot mark + the calibrated guard: identity lane must win
    assert res["lane"] == "resample" and res["rate"] == 1.0


def test_cli_embed_rejects_bad_message(wav_in, tmp_path):
    with pytest.raises(BaseException):
        main(["embed", wav_in, str(tmp_path / "x.wav"),
              "--message", "0" * 19, "--oneshot"])


def test_cli_oneshot_rejects_nonmodel_rate(tmp_path):
    p = str(tmp_path / "in44.wav")
    rng = np.random.default_rng(0)
    write_wav(p, rng.standard_normal(44100).astype(np.float32) * 0.1, 44100)
    with pytest.raises(SystemExit):
        main(["embed", p, str(tmp_path / "x.wav"),
              "--message", "1011", "--oneshot"])
