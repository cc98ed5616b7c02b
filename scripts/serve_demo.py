"""Serve recommendations from trained two-stage checkpoints.

The reference repo has no inference entry point at all — retrieval quality can
only be observed inside train_transformer.py's eval loop
(/root/reference/train_transformer.py:467-502). This script is the deployment
surface: it reconstructs the frozen tokenizer + decoder from a decoder gin
config plus the two checkpoint paths, builds a `RetrievalEngine`, and serves
top-K recommendations for real (or sampled) user histories.

Usage:
    python scripts/serve_demo.py configs/decoder_synthetic_large.gin \
        --stage1 out/hrqvae/.../hrqvae_ACC..._DUPR... \
        --stage2 out/decoder/.../checkpoint_50000 \
        [--users 8] [--top-k 10]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("gin_path", help="decoder gin config (model/tokenizer shapes)")
    ap.add_argument("--stage1", required=True, help="stage-1 (tokenizer) checkpoint dir")
    ap.add_argument("--stage2", required=True, help="stage-2 (decoder) checkpoint dir")
    ap.add_argument("--users", type=int, default=8, help="number of eval users to serve")
    ap.add_argument("--top-k", type=int, default=10)
    args = ap.parse_args()

    from hidvae_tpu.utils.runtime import configure_runtime

    configure_runtime()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hidvae_tpu.data.processed import ItemData, SeqData
    from hidvae_tpu.models.retrieval import EncoderDecoderRetrievalModel
    from hidvae_tpu.serve import RetrievalEngine
    from hidvae_tpu.train.common import restore_checkpoint
    from hidvae_tpu.train.transformer import _build_tokenizer
    from hidvae_tpu.utils.ginlite import parse_gin_file

    cfg = parse_gin_file(args.gin_path)["train"]
    g = cfg.get  # gin binding with default

    items = ItemData(
        root=cfg["dataset_folder"], dataset=cfg["dataset"],
        train_test_split="all", split=g("dataset_split", ""),
    )
    test_seq = SeqData(
        root=cfg["dataset_folder"], dataset=cfg["dataset"], subsample=False,
        split=g("dataset_split", ""), seq_split="test",
    )

    tokenizer = _build_tokenizer(
        use_h_tokenizer=g("use_h_tokenizer", True),
        pretrained_rqvae_path=args.stage1,
        vae_input_dim=cfg["vae_input_dim"],
        vae_embed_dim=cfg["vae_embed_dim"],
        vae_hidden_dims=tuple(cfg["vae_hidden_dims"]),
        vae_codebook_size=cfg["vae_codebook_size"],
        vae_n_layers=g("vae_n_layers", 3),
        vae_n_cat_feats=g("vae_n_cat_feats", 0),
        vae_codebook_normalize=g("vae_codebook_normalize", False),
        vae_sim_vq=g("vae_sim_vq", False),
        tag_alignment_weight=g("tag_alignment_weight", 0.5),
        tag_prediction_weight=g("tag_prediction_weight", 0.5),
        tag_class_counts=g("tag_class_counts"),
        tag_embed_dim=g("tag_embed_dim", 768),
        use_dedup_dim=g("use_dedup_dim", False),
        use_concatenated_ids=g("use_concatenated_ids", False),
        use_interleaved_ids=g("use_interleaved_ids", False),
        commitment_weight=g("commitment_weight", 0.25),
        rng=jax.random.key(0),
    )

    max_seq_len = test_seq.max_seq_len
    engine_model = EncoderDecoderRetrievalModel(
        embedding_dim=g("decoder_embed_dim", 128),
        attn_dim=g("attn_embed_dim", 512),
        dropout=g("dropout_p", 0.3),
        num_heads=g("attn_heads", 8),
        n_layers=g("attn_layers", 8),
        num_embeddings=cfg["vae_codebook_size"],
        sem_id_dim=tokenizer.sem_ids_dim,
        max_pos=max_seq_len * tokenizer.sem_ids_dim,
        n_sem_layers=g("vae_n_layers", 3),
        use_interleaved_ids=g("use_interleaved_ids", False),
    )

    print("Building corpus index + restoring decoder ...", file=sys.stderr)
    t0 = time.perf_counter()
    # Init params from an example batch, then overwrite with the checkpoint.
    d = tokenizer.sem_ids_dim
    t = max_seq_len * d
    from hidvae_tpu.data.schemas import TokenizedSeqBatch

    example = TokenizedSeqBatch(
        user_ids=jnp.zeros((2,), jnp.int32),
        sem_ids=jnp.zeros((2, t), jnp.int32),
        sem_ids_fut=jnp.zeros((2, d), jnp.int32),
        seq_mask=jnp.ones((2, t), bool),
        token_type_ids=jnp.tile(jnp.arange(d, dtype=jnp.int32), (2, max_seq_len)),
        token_type_ids_fut=jnp.tile(jnp.arange(d, dtype=jnp.int32), (2, 1)),
    )
    variables = engine_model.init(
        {"params": jax.random.key(1), "dropout": jax.random.key(2)}, example, False
    )
    restored = restore_checkpoint(
        args.stage2,
        {"params": variables["params"], "step": jnp.zeros((), jnp.int32)},
    )
    engine = RetrievalEngine(
        engine_model, restored["params"], tokenizer, items.item_features,
        max_seq_len=max_seq_len, batch_buckets=(args.users,),
    )
    print(f"engine ready in {time.perf_counter() - t0:.1f}s "
          f"(corpus {engine.n_items} x {engine.sem_id_dim})", file=sys.stderr)

    # Serve the first N test users' histories; the test target (items[-1])
    # tells us whether the recommendation actually hit.
    rng = np.random.RandomState(0)
    batch = test_seq.batch(np.arange(args.users), rng)
    hist = np.asarray(batch.ids)
    targets = np.asarray(batch.ids_fut)[:, 0]
    out = engine.recommend(hist, user_ids=np.asarray(batch.user_ids),
                           top_k=args.top_k)
    print(f"first request (incl. compile): {out['latency_s']:.1f}s",
          file=sys.stderr)
    out = engine.recommend(hist, user_ids=np.asarray(batch.user_ids),
                           top_k=args.top_k)
    users_per_s = args.users / out["latency_s"]
    print(f"steady-state: {out['latency_s'] * 1e3:.0f} ms / {args.users} users "
          f"({users_per_s:.0f} users/s)", file=sys.stderr)

    hits = 0
    for u in range(args.users):
        rec = out["items"][u]
        hit = targets[u] in rec
        hits += hit
        print(f"user {int(batch.user_ids[u])}: history {hist[u][hist[u] >= 0][-5:].tolist()} "
              f"-> top-{args.top_k} {rec.tolist()} "
              f"(target {targets[u]}, {'HIT' if hit else 'miss'})")
    print(f"hit@{args.top_k}: {hits}/{args.users}")


if __name__ == "__main__":
    main()
