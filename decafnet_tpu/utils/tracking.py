"""Experiment-metric sinks.

The reference pushes train/eval metrics to wandb with a HARDCODED API key
(reference: libs/helper/utils.py:100-141 -- do not replicate). Here the
canonical record is an append-only ``metrics.jsonl`` in the experiment dir,
and a push-based sink is layered on top, strictly env-gated:

  * ``WANDB_API_KEY`` set AND the wandb package importable -> wandb.init
    (project from ``WANDB_PROJECT`` or the config's aux.log group, run name
    = experiment name, resumable by deterministic id) and wandb.log per
    record;
  * otherwise the push sink is silently inactive (this offline environment
    has neither the package nor egress).

The run id is the experiment identity (aux.exp + runid), so crash/resume
continues the same remote run -- the semantic the reference implements via
a persisted wandb id in opt.yaml (libs/core/utils.py:271-282).
"""

from __future__ import annotations

import json
import os


class MetricsSink:
    """Append metrics records to ``metrics.jsonl`` and optionally push
    them to wandb (env-gated)."""

    def __init__(self, logdir, cfg=None, enabled=True):
        self.logdir = logdir
        self.enabled = enabled
        self.path = os.path.join(logdir, "metrics.jsonl") if logdir else None
        self._wandb = None
        if enabled and os.environ.get("WANDB_API_KEY"):
            try:
                import wandb
            except ImportError:
                wandb = None
            if wandb is not None:
                exp = runid = ""
                group = os.environ.get("WANDB_PROJECT", "decafnet_tpu")
                if cfg is not None:
                    exp = cfg.aux.get("exp", "")
                    runid = str(cfg.aux.get("runid", 0))
                    group = os.environ.get(
                        "WANDB_PROJECT", cfg.aux.get("log", group))
                run_id = f"{exp}-{runid}".strip("-") or None
                self._wandb = wandb.init(
                    project=group, name=exp or None, id=run_id,
                    resume="allow",
                    config=(cfg.to_dict() if cfg is not None
                            and hasattr(cfg, "to_dict") else None))

    def log(self, record, step=None):
        if not self.enabled:
            return
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            payload = {k: v for k, v in record.items()
                       if isinstance(v, (int, float))}
            self._wandb.log(payload, step=step)

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
            self._wandb = None
