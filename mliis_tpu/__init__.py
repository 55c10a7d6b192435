"""mliis-tpu: TPU-native few-shot image-segmentation meta-learning framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
ml4ai/mliis ("Meta-Learning Initializations for Image Segmentation",
arXiv:1912.06290): EfficientLab segmentation networks meta-trained with
Reptile / first-order MAML (FOMAML / FOMAML*) over episodic FSS-1000 tasks,
plus joint training, update-hyperparameter optimization (UHO), early
stopping, and k-shot learning-curve experiments.

Architecture (vs. the TF1 Session/feed_dict reference):
  - functional models (flax.linen) with explicit param / batch-stats pytrees;
  - whole meta-steps compiled as single XLA programs: `lax.scan` inner loops,
    `vmap` across the meta-batch of tasks, outer updates fused on-device;
  - device-resident episodic task store; augmentation as fused on-device
    kernels driven by per-sample PRNG keys;
  - scaling via `jax.sharding.Mesh` + `shard_map` over a `task` axis
    (and optional `data` axis with pmean sync-BN).
"""

__version__ = "0.1.0"
