"""Stage-2 retrieval-decoder training entry point.

Usage (parity with the reference CLI): python train_transformer.py configs/decoder_amazon.gin
"""

from hidvae_tpu.train.transformer import train
from hidvae_tpu.utils.config import parse_config_and_run

if __name__ == "__main__":
    parse_config_and_run(train)
