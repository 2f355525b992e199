"""Real-chip test tier configuration.

Unlike tests/ (which forces CPU + 8 fake devices), this tier runs on the
ambient JAX platform — the single real TPU chip through the `axon`
tunnel — and exercises the Mosaic-compiled kernels, the fused robust
grid, and the batch service entries that `pytest tests/` can only cover
in interpret mode.  Run it from the bench chip:

    python -m pytest tests_tpu -q

Cold Mosaic compiles are minutes; the persistent compile cache below
makes warm reruns ~1-2 min.  Do NOT set JAX_PLATFORMS.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if jax.config.jax_compilation_cache_dir is None:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/aware_tpu/jax"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    for item in items:
        item.add_marker(pytest.mark.tpu)


# ------------------------------------------------------- result artifact ---
# Every chip-tier run leaves an auditable record (pass/fail per test,
# kernel-path flags, jax/backend versions, git rev) so a green run on the
# final kernels is provable after the fact.  Output path overridable via
# AWARE_TIER_OUT (default: repo-root TPU_TIER.json).

_RESULTS: dict[str, str] = {}


def pytest_runtest_logreport(report):
    if report.when == "call" or (report.when == "setup" and report.skipped):
        _RESULTS[report.nodeid] = report.outcome


def pytest_sessionfinish(session, exitstatus):
    import datetime
    import json
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.environ.get("AWARE_TIER_OUT", os.path.join(repo, "TPU_TIER.json"))
    try:
        rev = subprocess.run(
            ["git", "-C", repo, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        rev = "unknown"
    try:
        devs = [str(d) for d in jax.devices()]
    except Exception as e:  # backend down — record that too
        devs = [f"unavailable: {e}"]
    counts = {
        k: sum(1 for v in _RESULTS.values() if v == k)
        for k in ("passed", "failed", "skipped")
    }
    from aware_tpu.config import AwareConfig

    cfg = AwareConfig()
    record = {
        "suite": "tests_tpu",
        "timestamp_utc": datetime.datetime.now(
            datetime.timezone.utc
        ).isoformat(timespec="seconds"),
        "git_rev": rev,
        "exitstatus": int(exitstatus),
        "counts": counts,
        "results": _RESULTS,
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": devs,
        "kernel_flags": {
            "use_pallas_roundtrip_default": cfg.use_pallas_roundtrip,
            "use_pallas_detector_default": cfg.use_pallas_detector,
            "use_pallas_iteration_default": cfg.use_pallas_iteration,
            "use_slab_dft_default": cfg.use_slab_dft,
        },
    }
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"\nchip-tier artifact written: {out}")


@pytest.fixture(scope="session", autouse=True)
def require_tpu():
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip(
            "real-chip tier requires the TPU backend "
            f"(got {jax.default_backend()!r})",
            allow_module_level=True,
        )


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def speechlike(rng) -> np.ndarray:
    """Same deterministic 2 s speech-like fixture as tests/conftest.py."""
    sr = 16000
    t = np.arange(2 * sr) / sr
    f0 = 120.0 + 30.0 * np.sin(2 * np.pi * 2.3 * t)
    x = np.zeros_like(t)
    phase = np.cumsum(2 * np.pi * f0 / sr)
    for k in range(1, 25):
        x += np.cos(k * phase) / k
    env = 0.4 + 0.6 * np.clip(np.sin(2 * np.pi * 3.1 * t), 0, None)
    x = x * env + 0.02 * rng.standard_normal(len(t))
    return (x / np.max(np.abs(x))).astype(np.float32)
