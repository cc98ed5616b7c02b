"""Stage-1 RQ-VAE tokenizer training entry point.

Usage (parity with the reference CLI): python train_rqvae.py configs/rqvae_amazon.gin
"""

from hidvae_tpu.train.rqvae import train
from hidvae_tpu.utils.config import parse_config_and_run

if __name__ == "__main__":
    parse_config_and_run(train)
