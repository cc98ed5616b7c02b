"""Diagnose why duplicate-pair mining didn't move XL repetition (run: CPU).

At FIXED params (the finished xl4m checkpoint), harvest colliding pairs from
an eval-mode audit, then check whether the TRAIN-mode forward (the one the
uniqueness loss sees) observes those pairs as colliding. Isolates
audit-vs-train-forward disagreement from pool staleness / param drift.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CKPT = sys.argv[1] if len(sys.argv) > 1 else (
    "out/hrqvae/synthetic_xl4m/hrqvae_SYNTHETIC_20260820_091526/latest"
)


def main():
    from hidvae_tpu.data.processed import ItemData, RecDataset
    from hidvae_tpu.train.transformer import _build_tokenizer

    tok = _build_tokenizer(
        use_h_tokenizer=True, pretrained_rqvae_path=CKPT,
        vae_input_dim=768, vae_embed_dim=32, vae_hidden_dims=(512, 256, 128),
        vae_codebook_size=256, vae_n_layers=4, vae_n_cat_feats=0,
        vae_codebook_normalize=True, vae_sim_vq=False,
        tag_alignment_weight=0.15, tag_prediction_weight=0.55,
        tag_class_counts=None, tag_embed_dim=768, use_dedup_dim=False,
        use_concatenated_ids=True, use_interleaved_ids=False,
        commitment_weight=0.4, rng=jax.random.key(0),
    )
    model = tok.hrq_vae
    variables = tok.variables

    items = ItemData(root="dataset/synthetic_xl", dataset=RecDataset.SYNTHETIC,
                     train_test_split="train")
    n = 50_000
    x = jnp.asarray(items.item_features[:n])

    # eval-mode audit ids (the pool-harvest view)
    @jax.jit
    def eval_ids(x):
        enc = model.apply(variables, x, method=lambda m, v: m.encode(v))
        out = model.apply(variables, enc, method=lambda m, e: m.get_semantic_ids(e))
        return out.sem_ids

    ids_eval = np.asarray(jax.lax.map(eval_ids, x.reshape(-1, 1000, 768)).reshape(n, -1))

    _, inverse, counts = np.unique(ids_eval, axis=0, return_inverse=True,
                                   return_counts=True)
    order = np.argsort(inverse, kind="stable")
    a, b = order[:-1], order[1:]
    same = inverse[a] == inverse[b]
    pa, pb = a[same], b[same]
    print(f"colliding pairs found (eval mode, {n} items): {len(pa)}")
    P = min(128, len(pa))
    sel = np.random.RandomState(0).choice(len(pa), P, replace=False)
    pa, pb = pa[sel], pb[sel]

    # train-mode forward on a batch [pair rows ; random rest] — what the
    # uniqueness loss sees (ROTATION_TRICK => argmin ids, same params).
    pair_idx = np.stack([pa, pb], 1).reshape(-1)
    rest = np.random.RandomState(1).randint(0, n, 1024 - 2 * P)
    bx = jnp.asarray(items.item_features[np.concatenate([pair_idx, rest])])

    @jax.jit
    def train_ids(bx):
        enc = model.apply(variables, bx, method=lambda m, v: m.encode(v))
        out = model.apply(
            variables, enc, None, None, 1.0, True,
            method=lambda m, e, te, ti, g, tr: m.get_semantic_ids(
                e, te, ti, g, train=tr),
            rngs={"gumbel": jax.random.key(7), "dropout": jax.random.key(8)},
        )
        return out.sem_ids

    ids_train = np.asarray(train_ids(bx))
    tp = ids_train[: 2 * P].reshape(P, 2, -1)
    eq_train = np.all(tp[:, 0] == tp[:, 1], axis=-1)
    ev = ids_eval[pair_idx].reshape(P, 2, -1)
    eq_eval = np.all(ev[:, 0] == ev[:, 1], axis=-1)
    # same-row agreement between modes
    agree = np.all(ids_train[: 2 * P] == ids_eval[pair_idx], axis=-1)
    uniq = len(np.unique(ids_train, axis=0))
    print(f"pairs equal under eval-mode ids: {eq_eval.mean():.3f}")
    print(f"pairs equal under TRAIN-mode ids: {eq_train.mean():.3f}")
    print(f"row-level train-vs-eval id agreement: {agree.mean():.3f}")
    print(f"in-batch p_unique (train mode): {uniq / 1024:.4f}")


if __name__ == "__main__":
    main()
