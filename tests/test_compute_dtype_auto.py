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


def test_eval_on_tpu_mad_scale_resolves_to_bf16(cfg, monkeypatch):
    """Round 5 root-caused and FIXED the round-4 "bf16 19% slower at MAD
    scale" regression (dtype-aware depthwise dispatch + MXU ones-dot LN /
    band-score statistics); bf16 now wins at every measured length
    (scripts/results/threshold_calibration.json), so the length gate is
    disabled and MAD-class configs resolve bf16 too."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg.model.vid_net.max_seq_len = 32768
    assert resolve_compute_dtype(cfg, eval_mode=True) == "bfloat16"
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


def test_grid_t_overrides_config_length(cfg, monkeypatch):
    """Round-5 (VERDICT item 3): the dtype gate is per-SHAPE, not
    per-config. Eval buckets grow past max_seq_len in pow-2 steps
    (data/batching.py:bucket_length); when a length gate is ACTIVE
    (monkeypatched here -- the shipped gate is disabled after the round-5
    fixes made bf16 win everywhere), a bucket crossing it resolves f32
    regardless of the config length."""
    from decafnet_tpu.models import decafnet

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # shipped: gate disabled, any grid length resolves bf16
    assert resolve_compute_dtype(cfg, eval_mode=True, grid_t=2304) \
        == "bfloat16"
    assert resolve_compute_dtype(cfg, eval_mode=True, grid_t=18432) \
        == "bfloat16"
    # with a gate active, grid_t (not the config length) decides
    monkeypatch.setattr(decafnet, "_BF16_AUTO_MAX_T", 16384)
    assert resolve_compute_dtype(cfg, eval_mode=True, grid_t=18432) \
        == "float32"
    cfg.model.vid_net.max_seq_len = 32768
    assert resolve_compute_dtype(cfg, eval_mode=True, grid_t=2304) \
        == "bfloat16"
    # explicit settings ignore grid_t
    cfg.tpu.compute_dtype = "bfloat16"
    assert resolve_compute_dtype(cfg, eval_mode=True, grid_t=32768) \
        == "bfloat16"


def test_evaluator_per_bucket_model(monkeypatch):
    """Evaluator._model_for_bucket caches one model per resolved dtype and
    routes buckets through the per-shape gate when one is active
    (eval/evaluator.py, round-5 VERDICT item 3; the shipped gate is
    disabled, so it is monkeypatched on here)."""
    from decafnet_tpu.core import update_opt
    from decafnet_tpu.eval.evaluator import Evaluator
    from decafnet_tpu.models import decafnet

    cfg = get_cfg_defaults("grounder")
    cfg.model.name = "iter"
    cfg.model.vid_net.in_dim = 32
    cfg.model.text_net.in_dim = 32
    update_opt(cfg)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(decafnet, "_BF16_AUTO_MAX_T", 16384)
    ev = Evaluator(cfg, train_time=True, params={}, build_loader=False)
    assert ev.compute_dtype == "bfloat16"
    m_short = ev._model_for_bucket(cfg.model.vid_net.max_seq_len)
    assert m_short is ev.model
    assert m_short.compute_dtype is jnp.bfloat16
    m_long = ev._model_for_bucket(18432)
    assert m_long is not ev.model
    assert m_long.compute_dtype is None  # float32
    # cached: same objects on repeat lookups
    assert ev._model_for_bucket(18432) is m_long
    assert ev._model_for_bucket(512) is m_short


def test_make_model_override(cfg):
    """make_model(cfg, compute_dtype=...) must override the config; with
    "auto" and no override it builds the train-semantics (f32) model."""
    assert make_model(cfg).compute_dtype is None
    assert make_model(cfg, compute_dtype="bfloat16").compute_dtype \
        is jnp.bfloat16
    cfg.tpu.compute_dtype = "bfloat16"
    assert make_model(cfg, compute_dtype="float32").compute_dtype is None
    assert make_model(cfg).compute_dtype is jnp.bfloat16
