"""Madrigal-TPU: a TPU-native multimodal drug-combination modeling framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
biopharmaai/Madrigal: four per-drug modality encoders (molecular-graph GIN,
heterogeneous-KG HGT, cell-viability MLP, chemCPA transcriptomics), a
missing-modality-masked fusion transformer, a symmetric bilinear pairxoutcome
decoder, contrastive pretraining, DDI finetuning, and a sharded on-device
all-pairs scoring + rank-normalization pipeline.
"""

__version__ = "0.1.0"
