from hidvae_tpu.ops.normalize import l2norm, rms_norm
from hidvae_tpu.ops.gumbel import gumbel_softmax_sample, sample_gumbel
from hidvae_tpu.ops.kmeans import kmeans
from hidvae_tpu.ops.distances import l2_distance, cosine_distance, nearest_code
