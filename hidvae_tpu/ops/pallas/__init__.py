from hidvae_tpu.ops.pallas.rq_kernels import rq_assign
