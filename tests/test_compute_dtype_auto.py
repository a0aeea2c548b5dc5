"""The "auto" compute-dtype resolution (round-4 bf16 promotion).

The pre-registered promotion study (scripts/bf16_promotion_study.py,
artifact scripts/results/bf16_promotion.json) promoted bfloat16 as the
default EVAL compute mode on TPU: 3 seeds x 600 steps, R1 counts identical
at every IoU threshold, zero R@5 flips, mode-agreement IoU >= 0.993,
top-1 IoU-vs-GT delta <= 0.0015. These tests pin the resolution semantics:

  * training always resolves "auto" to float32 (loss-norm EMA / AdamW
    moments are parity surfaces vs the reference Trainer),
  * eval resolves to bfloat16 ONLY on a TPU backend,
  * ``eval.reference_exact`` (the bit-parity mode) forces float32,
  * explicit "float32"/"bfloat16" settings always win.
"""

import jax
import jax.numpy as jnp
import pytest

from decafnet_tpu.core import get_cfg_defaults
from decafnet_tpu.models import make_model, resolve_compute_dtype


@pytest.fixture
def cfg():
    c = get_cfg_defaults("grounder")
    c.model.name = "iter"
    return c


def test_default_is_auto(cfg):
    assert cfg.tpu.compute_dtype == "auto"


def test_train_resolves_to_f32(cfg):
    assert resolve_compute_dtype(cfg, eval_mode=False) == "float32"


def test_eval_on_cpu_resolves_to_f32(cfg):
    # the test suite forces the CPU backend (conftest)
    assert jax.default_backend() == "cpu"
    assert resolve_compute_dtype(cfg, eval_mode=True) == "float32"


def test_eval_on_tpu_resolves_to_bf16(cfg, monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_compute_dtype(cfg, eval_mode=True) == "bfloat16"


def test_eval_on_tpu_mad_scale_resolves_to_f32(cfg, monkeypatch):
    """At MAD-class grid lengths the on-chip A/B measured bf16 as a 19%
    full-decode regression (chip_queue_r4d: 39.36 vs 31.78 ms at T=32768),
    so "auto" keeps f32 there (models/decafnet.py:_BF16_AUTO_MAX_T)."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg.model.vid_net.max_seq_len = 32768
    assert resolve_compute_dtype(cfg, eval_mode=True) == "float32"
    cfg.model.vid_net.max_seq_len = 2304
    assert resolve_compute_dtype(cfg, eval_mode=True) == "bfloat16"


def test_reference_exact_forces_f32(cfg, monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg.eval.reference_exact = True
    assert resolve_compute_dtype(cfg, eval_mode=True) == "float32"


def test_explicit_setting_wins(cfg, monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg.tpu.compute_dtype = "float32"
    assert resolve_compute_dtype(cfg, eval_mode=True) == "float32"
    cfg.tpu.compute_dtype = "bfloat16"
    assert resolve_compute_dtype(cfg, eval_mode=False) == "bfloat16"


def test_make_model_override(cfg):
    """make_model(cfg, compute_dtype=...) must override the config; with
    "auto" and no override it builds the train-semantics (f32) model."""
    assert make_model(cfg).compute_dtype is None
    assert make_model(cfg, compute_dtype="bfloat16").compute_dtype \
        is jnp.bfloat16
    cfg.tpu.compute_dtype = "bfloat16"
    assert make_model(cfg, compute_dtype="float32").compute_dtype is None
    assert make_model(cfg).compute_dtype is jnp.bfloat16
