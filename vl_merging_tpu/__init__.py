"""vl-merging-tpu: TPU-native VL-MoME training, evaluation, and merging.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
ylsung/vl-merging (VLMo-style MoME vision-language transformers plus a
checkpoint-merging suite), designed for SPMD execution over TPU meshes.
"""

__version__ = "0.1.0"
