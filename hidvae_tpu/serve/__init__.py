from hidvae_tpu.serve.engine import RetrievalEngine

__all__ = ["RetrievalEngine"]
