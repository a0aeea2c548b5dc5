"""The chip-claim watchdog (utils/backend.py) shared by the CLIs and bench.

A wedged axon relay makes the first jax backend resolution block forever
inside a native call (CLAUDE.md round-3 notes); the watchdog must exit with
a diagnosis instead of hanging, pass healthy resolutions through, and
re-raise resolution errors on the caller's thread so bench.require_tpu's
retry policy keeps working.
"""

import threading

import pytest

from decafnet_tpu.utils import backend as backend_mod


def test_healthy_resolution_passes_through():
    assert backend_mod.resolve_backend_or_exit() == "cpu"


def test_wedged_claim_exits_with_diagnosis(monkeypatch):
    import jax

    release = threading.Event()
    monkeypatch.setattr(jax, "default_backend",
                        lambda: release.wait(30.0) and "never")
    with pytest.raises(SystemExit, match="wedged"):
        backend_mod.resolve_backend_or_exit(timeout=0.2)
    release.set()  # unblock the daemon thread promptly


def test_resolution_error_reraised_on_caller(monkeypatch):
    import jax

    def boom():
        raise RuntimeError("No jellyfish device found")

    monkeypatch.setattr(jax, "default_backend", boom)
    with pytest.raises(RuntimeError, match="jellyfish"):
        backend_mod.resolve_backend_or_exit(timeout=5.0)


def test_timeout_env_var_respected(monkeypatch):
    import jax

    release = threading.Event()
    monkeypatch.setattr(jax, "default_backend",
                        lambda: release.wait(30.0) and "never")
    monkeypatch.setenv("DECAFNET_CLAIM_TIMEOUT_S", "0.2")
    with pytest.raises(SystemExit, match="> 0s|wedged"):
        backend_mod.resolve_backend_or_exit()
    release.set()
