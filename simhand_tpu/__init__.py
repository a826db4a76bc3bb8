"""simhand_tpu — a TPU-native JAX framework for large-scale 3D hand pose
pre-training, fine-tuning and evaluation.

Re-designed from scratch for TPU (jax / XLA / pallas / pjit) with the full
capability surface of the SiMHand reference (ICLR 2025, arXiv:2502.15251):

* Hand100M similar-hand mining as a sharded on-device top-k job
  (``simhand_tpu.mining``).
* Contrastive pre-training — SimCLR / PeCLR / SiMHand families with
  distance-adaptive weighting — with embeddings all-gathered over the ICI
  mesh so NT-Xent sees the *global* negative set (``simhand_tpu.losses``,
  ``simhand_tpu.train``).
* Fine-tuning & evaluation on 3D hand-pose benchmarks with a detnet-style
  heatmap/location-map head and EPE/PCK/AUC evaluation
  (``simhand_tpu.finetune``, ``simhand_tpu.experiments.evaluation``).
"""

__version__ = "0.1.0"
