"""Single-device dry-run replica of the RQ-VAE trainer, for inspection.

Parity: reference scripts/view_train_rqvae.py (verbose single-device trainer
replica without the distributed wrapper — a de-facto debug harness,
SURVEY.md §4.2). Runs a handful of steps on CPU with tiny shapes, printing
per-step losses, codebook stats, and the corpus ID table head.

Usage: python scripts/view_train_rqvae.py [--iterations 20]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iterations", type=int, default=20)
    parser.add_argument("--root", default="/tmp/hidvae_view_ds")
    args = parser.parse_args()

    from hidvae_tpu.data.processed import RecDataset, processed_path
    from hidvae_tpu.data.synthetic import build_synthetic
    from hidvae_tpu.train.rqvae import train

    path = processed_path(args.root, RecDataset.SYNTHETIC)
    if not os.path.exists(path):
        build_synthetic(n_items=500, n_users=100, feature_dim=64,
                        tag_dim=32, max_seq_len=10).save(path)

    result = train(
        iterations=args.iterations,
        batch_size=32,
        learning_rate=1e-3,
        dataset_folder=args.root,
        dataset=RecDataset.SYNTHETIC,
        save_dir_root="/tmp/hidvae_view_out/",
        eval_every=max(args.iterations, 1),
        save_model_every=max(args.iterations, 1),
        vae_input_dim=64,
        vae_n_cat_feats=0,
        vae_hidden_dims=(64, 32),
        vae_embed_dim=16,
        vae_codebook_size=64,
        use_dedup_dim=True,
        eval_batches=2,
        log_every=1,
        make_plots=False,
    )

    print("\n== Final metrics ==")
    hist = result["history"]
    print(f"loss: {hist['total_loss'][0]:.4f} -> {hist['total_loss'][-1]:.4f}")
    if hist["repetition_rate"]:
        print(f"repetition rate: {hist['repetition_rate'][-1]:.4f}")
    print(f"checkpoints: {result['saved_paths']}")

    # Corpus ID table head through the tokenizer (incl. dedup column).
    from hidvae_tpu.data.processed import ItemData
    from hidvae_tpu.tokenizer import SemanticIdTokenizer

    items = ItemData(args.root, RecDataset.SYNTHETIC, train_test_split="all")
    tok = SemanticIdTokenizer(
        result["model"], {"params": result["state"].params},
        n_layers=3, codebook_size=64, use_dedup_dim=True,
    )
    corpus = np.asarray(tok.precompute_corpus_ids(items.item_features))
    print(f"\ncorpus IDs {corpus.shape} (last col = dedup rank):")
    print(corpus[:5])
    print(f"max duplicates: {corpus[:, -1].max() + 1}")


if __name__ == "__main__":
    main()
