"""deepblast_tpu — a TPU-native differentiable protein alignment framework.

A from-scratch JAX / XLA / Pallas re-design with the capabilities of
DeepBLAST (flatironinstitute/deepblast): differentiable smoothed
Needleman-Wunsch / Smith-Waterman alignment driven by protein language-model
embeddings, trained against structural alignments.
"""

__version__ = "0.1.0"
