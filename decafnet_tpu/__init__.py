"""decafnet_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for efficient
temporal sentence grounding in long videos, with the full capabilities of the
DeCafNet reference (CVPR 2025, ZijiaLewisLu/CVPR2025-DeCafNet).

Layering (bottom-up, see SURVEY.md section 7):
  ops/       -- pure-function kernels: masked conv/pool/norm, banded local
                attention (XLA + Pallas backends), 1D (Soft)NMS (on-device JAX
                formulation + C++ host oracle).
  nn/        -- flax modules mirroring the reference block semantics
                (reference: libs/modeling/blocks.py).
  models/    -- text / video / fusion / head networks, saliency delegation,
                candidate-point generation, the DeCafNet grounder, and the
                torch checkpoint importer.
  data/      -- host-side data pipeline: annotations, feature loading,
                video-centric query grouping, static-shape batching.
  train/     -- losses, point annotation, optax optimizer/schedules, EMA,
                the jitted SPMD train step and the training loop.
  eval/      -- batched evaluator (queries vmapped on device), proposal
                decoding, R@k/IoU metrics.
  parallel/  -- device-mesh and sharding helpers.
  core/      -- config tree with task defaults and diff-based experiment
                naming (reference: libs/core/opt.py, libs/core/utils.py).
"""

__version__ = "0.1.0"
