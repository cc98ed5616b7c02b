"""Integrated multi-device pipeline test (VERDICT r3 next #9): stage-1 train
-> tokenize -> stage-2 train (DP+TP) -> full constrained-beam eval ->
RetrievalEngine, all in ONE flow on the 8-CPU virtual mesh, asserting the
multi-chip engine's recommendations match a single-device engine serving the
SAME artifacts. The individual pieces are covered by tests/test_parallel.py
and tests/test_serve.py; this exercises the HANDOFFS between them — the
checkpoint formats, the tokenizer rebuild, the TP opt-state resharding, and
the mesh-vs-host serving equivalence."""

import numpy as np
import pytest

from hidvae_tpu.data.processed import RecDataset, processed_path
from hidvae_tpu.data.synthetic import build_synthetic

TINY = dict(
    n_items=200, n_users=40, feature_dim=32, tag_dim=16,
    max_seq_len=8, min_seq_len=4, level_branching=(4, 2, 2),
)


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_md"))
    arrays = build_synthetic(**TINY)
    arrays.save(processed_path(root, RecDataset.SYNTHETIC))
    return root


def test_full_pipeline_dp_tp_to_serving(dataset_root, tmp_path):
    import jax

    from hidvae_tpu.parallel.mesh import make_mesh
    from hidvae_tpu.serve import RetrievalEngine
    from hidvae_tpu.train.hidvae import train as train_s1
    from hidvae_tpu.train.transformer import train as train_s2

    assert len(jax.devices()) == 8, "conftest must provision 8 CPU devices"

    # ---- stage 1: HiD-VAE tokenizer training, DP over all 8 devices ----
    s1 = train_s1(
        iterations=4, batch_size=16, dataset_folder=dataset_root,
        dataset=RecDataset.SYNTHETIC, save_dir_root=str(tmp_path / "s1"),
        eval_every=4, save_model_every=4, vae_input_dim=TINY["feature_dim"],
        vae_n_cat_feats=0, vae_hidden_dims=(32, 16), vae_embed_dim=8,
        vae_codebook_size=32, vae_n_layers=3,
        tag_embed_dim=TINY["tag_dim"], rare_tag_threshold=3,
        eval_batches=1, make_plots=False, do_eval=True, eval_tta=False,
    )
    s1_ckpt = [p for p in s1["saved_paths"] if p.endswith("latest")][-1]
    counts = list(s1["tag_class_counts"])

    # ---- stage 2: decoder training on the frozen tokenizer, DP4 x TP2,
    # with a full constrained-beam eval at the end of the budget ----
    s2 = train_s2(
        iterations=4, batch_size=8, dataset_folder=dataset_root,
        dataset=RecDataset.SYNTHETIC, save_dir_root=str(tmp_path / "s2"),
        partial_eval_every=10_000, full_eval_every=4,
        save_model_every=4, pretrained_rqvae_path=s1_ckpt,
        vae_input_dim=TINY["feature_dim"], vae_n_cat_feats=0,
        vae_hidden_dims=(32, 16), vae_embed_dim=8, vae_codebook_size=32,
        vae_n_layers=3, use_h_tokenizer=True, tag_embed_dim=TINY["tag_dim"],
        tag_class_counts=counts,
        decoder_embed_dim=16, attn_embed_dim=32, attn_heads=2, attn_layers=2,
        eval_batches=1, log_every=2, make_plots=False,
        n_model_shards=2,
    )
    s2_ckpt = s2["saved_paths"][-1]
    # The TP run really sharded the decoder.
    out_spec = s2["state"].params["out_proj"]["kernel"].sharding.spec
    assert tuple(out_spec) == (None, "model"), out_spec
    # The full eval ran and produced the metric surface.
    evals = s2["history"]["full_eval_metrics"]
    assert evals, "full eval must have fired at the end of the budget"
    assert "h@10_slice_:3" in evals[-1]

    # ---- serving: engine rebuilt purely from the on-disk artifacts ----
    gin_path = str(tmp_path / "serve.gin")
    with open(gin_path, "w") as f:
        f.write(
            "import data.processed\n"
            f'train.dataset_folder = "{dataset_root}"\n'
            "train.dataset = %data.processed.RecDataset.SYNTHETIC\n"
            f"train.vae_input_dim = {TINY['feature_dim']}\n"
            "train.vae_hidden_dims = [32, 16]\n"
            "train.vae_embed_dim = 8\n"
            "train.vae_codebook_size = 32\n"
            "train.vae_n_layers = 3\n"
            "train.vae_n_cat_feats = 0\n"
            "train.use_h_tokenizer = True\n"
            f"train.tag_embed_dim = {TINY['tag_dim']}\n"
            f"train.tag_class_counts = {counts}\n"
            "train.decoder_embed_dim = 16\n"
            "train.attn_embed_dim = 32\n"
            "train.attn_heads = 2\n"
            "train.attn_layers = 2\n"
        )

    mesh = make_mesh(n_data=4, n_model=2)
    sharded = RetrievalEngine.from_artifacts(
        gin_path, s1_ckpt, s2_ckpt, batch_buckets=(8,),
        mesh=mesh, shard_params=True,
    )
    single = RetrievalEngine.from_artifacts(
        gin_path, s1_ckpt, s2_ckpt, batch_buckets=(8,),
    )

    # Same artifacts -> bit-identical corpus ID tables on both placements.
    np.testing.assert_array_equal(
        np.asarray(sharded.corpus_ids), np.asarray(single.corpus_ids)
    )

    rng = np.random.RandomState(7)
    hist = rng.randint(0, TINY["n_items"], (6, 4))
    got = sharded.recommend(hist, top_k=5)
    want = single.recommend(hist, top_k=5)
    np.testing.assert_array_equal(got["items"], want["items"])
    np.testing.assert_allclose(got["scores"], want["scores"], atol=1e-5)
    # Constrained generation: every tuple resolves to a real corpus row.
    corpus = np.asarray(single.corpus_ids)
    np.testing.assert_array_equal(
        corpus[got["items"].reshape(-1)],
        got["sem_ids"].reshape(-1, single.sem_id_dim),
    )
