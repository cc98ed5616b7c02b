"""Stage-1 HiD-VAE (hierarchically-supervised tokenizer) training entry point.

Usage (parity with the reference CLI): python train_hidvae.py configs/h_rqvae_amazon.gin
"""

from hidvae_tpu.train.hidvae import train
from hidvae_tpu.utils.config import parse_config_and_run

if __name__ == "__main__":
    parse_config_and_run(train)
