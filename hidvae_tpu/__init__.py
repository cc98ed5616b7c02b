"""hidvae_tpu: a TPU-native (JAX / XLA / Pallas) two-stage generative-retrieval
recommender framework with the capabilities of FDzhaozi/HiD-VAE.

Stage 1 (tokenizer): RQ-VAE / hierarchically-supervised HiD-VAE maps item text
embeddings to multi-level discrete semantic IDs (see ``hidvae_tpu.models.rqvae`` /
``hidvae_tpu.models.hrqvae``).

Stage 2 (retrieval): a transformer encoder-decoder trained on frozen-tokenizer ID
sequences generates the next item's semantic ID with prefix-constrained beam search
(see ``hidvae_tpu.models.retrieval``).

Reference capability map: /root/reference (PyTorch/Triton); see SURVEY.md.
This is a ground-up JAX design: functional modules, pure jitted train steps over a
``jax.sharding.Mesh``, Pallas kernels for the quantizer hot path, fixed-shape XLA
beam search, and Orbax checkpointing.
"""

__version__ = "0.1.0"
