"""CLI entry-point plumbing: `python train_X.py configs/Y.gin`
(parity: reference modules/utils.py:58-62 parse_config)."""

import argparse

from hidvae_tpu.utils.ginlite import bind_to_kwargs, parse_gin_file


def parse_config_and_run(train_fn, argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config_path", type=str, help="Path to gin config file.")
    args = parser.parse_args(argv)
    config = parse_gin_file(args.config_path)
    kwargs = bind_to_kwargs(config, "train", train_fn)
    return train_fn(**kwargs)
