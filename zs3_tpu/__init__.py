"""zs3_tpu — a TPU-native zero-shot semantic segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of valeoai/ZS3
(Bucher et al., "Zero-Shot Semantic Segmentation", NeurIPS 2019,
arXiv:1906.00817):

  * DeepLabv3+ segmentation backbone (atrous ResNet-101 / Xception / DRN /
    MobileNetV2 + ASPP + decoder) with a first-class feature/classifier
    split so the last-layer pixel classifier can be retrained in isolation.
  * GMMN generator mapping (class embedding, noise) -> pixel features,
    trained with a multi-bandwidth Gaussian-kernel MMD loss (Pallas tiled
    kernel on TPU, jnp reference elsewhere).
  * ZS3Net zero-shot pipeline: classifier retraining on synthesized
    unseen-class features entirely in HBM.
  * ZS5Net self-training with pseudo-labels, and the graph-context GMMN
    variant with spatial-context priors.
  * Pascal-VOC (+SBD) and Pascal-Context data pipelines with seen/unseen
    split registries and on-device preprocessing.
  * On-device confusion matrix -> seen / unseen / harmonic mIoU.

Design notes (TPU-first, not a port):
  * NHWC layout everywhere; bf16 compute / f32 params policy.
  * Everything in the hot path is jit-compiled with static shapes; ragged
    per-class pixel sets are handled with fixed budgets + masks.
  * Scaling is expressed through ``jax.sharding.Mesh`` + NamedSharding
    (data parallelism today; the mesh API leaves room for spatial
    sharding). Cross-replica BatchNorm falls out of global-batch jit
    semantics / ``axis_name`` pmean rather than a SyncBN rendezvous.
"""

__version__ = "0.1.0"
