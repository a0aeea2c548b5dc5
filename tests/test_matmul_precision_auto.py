"""The "auto" matmul-precision resolution (round-4 precision promotion).

The MAD-scale stage profile measured the full T=32768 eval call at 31.8 ms
under precision "high" vs 24.1 ms under "default" (-24%,
scripts/results/mad_stage_profile*.json) -- the only eval-speed lever live
at MAD-class lengths, where the bf16 COMPUTE mode regresses. The
pre-registered numerics study (scripts/precision_promotion_study.py,
artifact scripts/results/precision_promotion.json) gates the eval-mode
"default" resolution. These tests pin the semantics:

  * training always resolves "auto" to "high" (TF32-class, the accuracy
    class of the reference's A100 cudnn convs),
  * eval resolves to "default" ONLY on a TPU backend,
  * ``eval.reference_exact`` (the bit-parity mode) forces "highest",
  * explicit "default"/"high"/"highest" settings always win.
"""

import jax
import pytest

from decafnet_tpu.core import get_cfg_defaults
from decafnet_tpu.models import resolve_matmul_precision


@pytest.fixture
def cfg():
    c = get_cfg_defaults("grounder")
    c.model.name = "iter"
    return c


def test_default_is_auto(cfg):
    assert cfg.tpu.matmul_precision == "auto"


def test_train_resolves_to_high(cfg, monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg.tpu.matmul_precision = "auto"
    assert resolve_matmul_precision(cfg, eval_mode=False) == "high"


def test_eval_on_cpu_resolves_to_high(cfg):
    # the test suite forces the CPU backend (conftest)
    assert jax.default_backend() == "cpu"
    cfg.tpu.matmul_precision = "auto"
    assert resolve_matmul_precision(cfg, eval_mode=True) == "high"


def test_eval_on_tpu_resolves_to_default(cfg, monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg.tpu.matmul_precision = "auto"
    assert resolve_matmul_precision(cfg, eval_mode=True) == "default"


def test_reference_exact_forces_highest(cfg, monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg.tpu.matmul_precision = "auto"
    cfg.eval.reference_exact = True
    assert resolve_matmul_precision(cfg, eval_mode=True) == "highest"
    # ... in BOTH phases (a reference_exact training run wants bit parity)
    assert resolve_matmul_precision(cfg, eval_mode=False) == "highest"


def test_explicit_setting_wins(cfg, monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    for value in ("default", "high", "highest"):
        cfg.tpu.matmul_precision = value
        assert resolve_matmul_precision(cfg, eval_mode=True) == value
        assert resolve_matmul_precision(cfg, eval_mode=False) == value
