"""Single-device dry-run replica of the HiD-VAE trainer, for inspection.

Parity: reference scripts/view_train_hrqvae.py (verbose single-device trainer
replica, SURVEY.md §4.2) + the h_semids.py __main__ smoke block (tokenize a
few sequences, print tag predictions vs ground truth, replay the rare-tag
remap — ref modules/tokenizer/h_semids.py:534-760).

Usage: python scripts/view_train_hrqvae.py [--iterations 30]
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
    parser.add_argument("--iterations", type=int, default=30)
    parser.add_argument("--root", default="/tmp/hidvae_view_ds")
    args = parser.parse_args()

    from hidvae_tpu.data.processed import ItemData, RecDataset, SeqData, processed_path
    from hidvae_tpu.data.synthetic import build_synthetic
    from hidvae_tpu.tokenizer import HSemanticIdTokenizer
    from hidvae_tpu.train.hidvae import train

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
        tag_embed_dim=32,
        rare_tag_threshold=3,
        use_focal_loss=True,
        eval_batches=2,
        log_every=1,
        make_plots=False,
        id_repetition_threshold=1.0,
    )
    hist = result["history"]
    print("\n== Final metrics ==")
    print(f"loss: {hist['total_loss'][0]:.4f} -> {hist['total_loss'][-1]:.4f}")
    print(f"tag accuracy: {hist['tag_pred_accuracy'][-1]:.4f}")
    print(f"remapped tag_class_counts: {result['tag_class_counts']}")
    print(f"rare tags collapsed per level: "
          f"{ {k: len(v) for k, v in result['rare_tags'].items()} }")

    # Tokenize a few sequences and compare tag predictions vs ground truth
    # (the reference's h_semids __main__ smoke, h_semids.py:534-760).
    state = result["state"]
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    tok = HSemanticIdTokenizer(
        result["model"], variables, n_layers=3, codebook_size=64,
        tag_class_counts=result["tag_class_counts"], use_concatenated_ids=True,
    )
    items = ItemData(args.root, RecDataset.SYNTHETIC, train_test_split="all")
    corpus = tok.precompute_corpus_ids(items.item_features)
    print(f"\ncorpus IDs (concat layout, [s1 s2 s3 t1 t2 t3]): {corpus.shape}")
    print(np.asarray(corpus[:5]))

    seq = SeqData(args.root, RecDataset.SYNTHETIC, is_train=False)
    batch = seq.batch(np.arange(min(5, len(seq))))
    tokenized = tok(batch)
    print(f"\ntokenized eval batch: sem_ids {tokenized.sem_ids.shape}, "
          f"fut {tokenized.sem_ids_fut.shape}")

    # Replay the rare-tag remap on the displayed ground truth so it lives in
    # the same label space as the model (ref h_semids.py:573-640 smoke).
    from hidvae_tpu.train.tags import apply_tag_remap, compute_rare_tag_remap

    train_items = ItemData(args.root, RecDataset.SYNTHETIC, train_test_split="train")
    orig_counts = [int(train_items.tags_indices[:, i].max()) + 1 for i in range(3)]
    _, id_mappings, _ = compute_rare_tag_remap(
        train_items.tags_indices, orig_counts, rare_tag_threshold=3
    )
    truth_all = apply_tag_remap(items.tags_indices, id_mappings)

    preds = tok.predict_tags(items.item_features[:5])
    truth = truth_all[:5]
    print("\ntag predictions vs ground truth (remapped space, first 5 items):")
    for i in range(5):
        print(f"  item {i}: pred {np.asarray(preds['predictions'][i]).tolist()} "
              f"(conf {np.asarray(preds['confidences'][i]).round(2).tolist()}) "
              f"vs truth {truth[i].tolist()}")


if __name__ == "__main__":
    main()
