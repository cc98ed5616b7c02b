from hidvae_tpu.evaluate.metrics import NDCGAccumulator, TopKAccumulator
