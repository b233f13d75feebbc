"""vlp3d — TPU-native 3D vision-language pretraining framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of 3DVLP
(reference: taolinzhang/3DVLP): ScanRefer visual grounding, Scan2Cap dense
captioning, and ScanQA visual question answering from one jointly-trained
model, with OID/OCC/OSC pretraining objectives.

Layering (bottom-up):
  ops/       fixed-shape point-cloud primitives (FPS, ball query, grouping,
             3-NN interpolation, NMS) — Pallas TPU kernels + XLA reference paths
  geometry/  boxes (IoU/DIoU/corners), Chamfer nn_distance
  models/    flax modules: backbone, voting, proposal, relation, BERT, match,
             contrast, caption, answer → JointNet
  losses/    fully-vectorized joint loss (vote/objectness/box/OID/OCC/OSC/...)
  data/      ScanNet preprocessing, joint dataset, augmentation, synthetic scenes
  parallel/  device mesh + sharding rules (dp/fsdp over ICI)
  train/     train state, optimizer groups, schedules, solver, checkpointing
  eval/      grounding/caption/VQA/mAP metrics
  cli/       entry points mirroring the reference's public surface
"""

__version__ = "0.1.0"
