"""The "auto" matmul-precision resolution.

Round 4 promoted "default" for TPU eval after a 604-step pre-registered
study passed (scripts/results/precision_promotion_600.json). Round 5
re-ran the identical rule at 2004 delivered steps and it FAILED
(precision_promotion_2000.json: seed 0, one R@5 count flip in 12 queries;
R1 identical everywhere), firing the pre-registered revert trigger --
"auto" resolves "high" for eval again. The revert is measured as free in
the shipped path because eval compute is bf16 since round 5 (bf16-input
dots are single-pass regardless of this lever: 2.92 "high" vs 3.14 ms
"default" at T=2304, 21.69 vs 21.89 at T=32768;
scripts/results/prec_ab_{high,default}.json). These tests pin:

  * training resolves "auto" to "high" (TF32-class, the accuracy class
    of the reference's A100 cudnn convs),
  * eval resolves "auto" to "high" as well (the round-5 revert), on any
    backend,
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


def test_eval_on_tpu_resolves_to_high(cfg, monkeypatch):
    """The round-5 revert: the 2004-step re-run of the pre-registered
    precision study failed its rule, so eval "auto" is "high" again
    (models/decafnet.py:resolve_matmul_precision history note)."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg.tpu.matmul_precision = "auto"
    assert resolve_matmul_precision(cfg, eval_mode=True) == "high"


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
