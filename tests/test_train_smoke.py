"""End-to-end smoke tests: all three trainers run on a tiny synthetic corpus,
losses stay finite, checkpoints round-trip, and the gin config surface parses."""

import glob
import os

import numpy as np
import pytest

from hidvae_tpu.data.processed import (
    ItemData,
    ProcessedArrays,
    RecDataset,
    SeqData,
    processed_path,
)
from hidvae_tpu.data.synthetic import build_synthetic

TINY = dict(
    n_items=200, n_users=40, feature_dim=32, tag_dim=16,
    max_seq_len=8, min_seq_len=4, level_branching=(4, 2, 2),
)


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    arrays = build_synthetic(**TINY)
    arrays.save(processed_path(root, RecDataset.SYNTHETIC))
    return root


class TestData:
    def test_item_data_splits(self, dataset_root):
        all_items = ItemData(dataset_root, RecDataset.SYNTHETIC, train_test_split="all")
        train = ItemData(dataset_root, RecDataset.SYNTHETIC, train_test_split="train")
        evald = ItemData(dataset_root, RecDataset.SYNTHETIC, train_test_split="eval")
        assert len(train) + len(evald) == len(all_items) == TINY["n_items"]
        assert all_items.has_tags
        assert all_items.tags_indices.shape == (TINY["n_items"], 3)

    def test_seq_data_batches(self, dataset_root):
        seq = SeqData(dataset_root, RecDataset.SYNTHETIC, is_train=True, subsample=True)
        rng = np.random.RandomState(0)
        batch = seq.batch(np.arange(8), rng)
        assert batch.ids.shape == (8, TINY["max_seq_len"])
        assert batch.x.shape == (8, TINY["max_seq_len"], TINY["feature_dim"])
        # Padded rows are -1 features.
        padded = np.asarray(batch.x)[~np.asarray(batch.seq_mask)]
        if len(padded):
            assert (padded == -1.0).all()
        assert batch.ids_fut.shape == (8, 1)
        assert (np.asarray(batch.ids_fut) >= 0).all()

    def test_subsample_changes_targets(self, dataset_root):
        seq = SeqData(dataset_root, RecDataset.SYNTHETIC, is_train=True, subsample=True)
        base = seq.batch(np.arange(16), None)
        sub = seq.batch(np.arange(16), np.random.RandomState(1))
        assert (np.asarray(base.ids_fut) != np.asarray(sub.ids_fut)).any()

    def test_three_way_sequence_split(self, dataset_root):
        """Leave-one-out three-way split (ref data/amazon.py:65-91): eval
        targets items[-2]; TEST targets items[-1] over one-longer histories."""
        train = SeqData(dataset_root, RecDataset.SYNTHETIC, seq_split="train")
        evald = SeqData(dataset_root, RecDataset.SYNTHETIC, seq_split="eval")
        test = SeqData(dataset_root, RecDataset.SYNTHETIC, seq_split="test")
        assert len(train) == len(evald) == len(test) == TINY["n_users"]
        # Legacy flag selects train/eval, never test rows.
        assert len(SeqData(dataset_root, RecDataset.SYNTHETIC, is_train=False)) \
            == len(evald)
        # Test histories contain one more item (the eval target) per user.
        ev_len = (evald.items >= 0).sum(1)
        te_len = (test.items >= 0).sum(1)
        assert (te_len >= ev_len).all() and (te_len > ev_len).any()
        # The eval target is the last history item of the test row.
        last = test.items[np.arange(len(test)), te_len - 1]
        np.testing.assert_array_equal(last, evald.fut)

    def test_cat_feats_and_pool_size(self):
        """ML-32M-flavored knobs (scripts/make_synthetic_ml32m.py): trailing
        categorical one-hot features (ref data/ml32m.py:80-87) and the
        revisit-pool size controlling next-item learnability."""
        arrays = build_synthetic(**{**TINY, "n_cat_feats": 18})
        assert arrays.item_features.shape == (
            TINY["n_items"], TINY["feature_dim"] + 18)
        cats = arrays.item_features[:, -18:]
        assert set(np.unique(cats)) <= {0.0, 1.0}
        dense = arrays.item_features[:, :-18]
        np.testing.assert_allclose(np.linalg.norm(dense, axis=-1), 1.0, atol=1e-5)

        def mean_unique(pool_size):
            arr = build_synthetic(**{**TINY, "pool_size": pool_size})
            rows = arr.seq_items[arr.seq_split == 0]
            return np.mean([len(np.unique(r[r >= 0])) for r in rows])

        # Larger revisit pools -> more distinct items per history.
        assert mean_unique(64) > mean_unique(4)

    def test_seq_split_roundtrips_npz(self, dataset_root, tmp_path):
        from hidvae_tpu.data.processed import ProcessedArrays

        arrays = build_synthetic(**TINY)
        p = str(tmp_path / "roundtrip.npz")
        arrays.save(p)
        loaded = ProcessedArrays.load(p)
        np.testing.assert_array_equal(loaded.seq_split, arrays.seq_split)
        # Old files without seq_split derive it from seq_is_train.
        loaded.seq_split = None
        loaded.__post_init__()
        assert set(np.unique(loaded.seq_split)) <= {0, 1, 2}


class TestHidvaeTrainer:
    def test_short_run(self, dataset_root, tmp_path):
        from hidvae_tpu.train.hidvae import train

        result = train(
            iterations=4,
            batch_size=16,
            learning_rate=1e-3,
            dataset_folder=dataset_root,
            dataset=RecDataset.SYNTHETIC,
            save_dir_root=str(tmp_path / "out"),
            eval_every=4,
            save_model_every=4,
            vae_input_dim=TINY["feature_dim"],
            vae_n_cat_feats=0,
            vae_hidden_dims=(32, 16),
            vae_embed_dim=8,
            vae_codebook_size=32,
            vae_n_layers=3,
            tag_embed_dim=TINY["tag_dim"],
            rare_tag_threshold=3,
            use_focal_loss=True,
            layer_specific_lr=True,
            gradient_accumulate_every=1,
            eval_batches=2,
            log_every=1,
            make_plots=True,
            id_repetition_threshold=1.0,
        )
        hist = result["history"]
        assert len(hist["total_loss"]) >= 2
        assert np.isfinite(hist["total_loss"]).all()
        assert result["saved_paths"], "expected at least one checkpoint"
        assert len(result["tag_class_counts"]) == 3
        # Plots got written.
        assert glob.glob(os.path.join(result["save_dir"], "plots", "*.png"))

    def test_short_run_depth_exceeds_tag_levels(self, dataset_root, tmp_path):
        """Regression for the xl4 config path (vae_n_layers=4 over a 3-level
        tag dataset): the derived counts gain a trailing 0 for the untagged
        level (no zero-width tag head) and the TTA eval compares predictions
        against the tag levels only, not the -1-padded 4th column."""
        from hidvae_tpu.train.hidvae import train

        result = train(
            iterations=4, batch_size=16, learning_rate=1e-3,
            dataset_folder=dataset_root, dataset=RecDataset.SYNTHETIC,
            save_dir_root=str(tmp_path / "out"),
            eval_every=4, save_model_every=4,
            vae_input_dim=TINY["feature_dim"], vae_n_cat_feats=0,
            vae_hidden_dims=(32, 16), vae_embed_dim=8,
            vae_codebook_size=32, vae_n_layers=4,
            tag_embed_dim=TINY["tag_dim"], rare_tag_threshold=3,
            use_focal_loss=True, eval_batches=2, log_every=2,
            make_plots=False, eval_tta=True, id_repetition_threshold=1.0,
        )
        hist = result["history"]
        assert np.isfinite(hist["total_loss"]).all()
        # 4 levels of class counts recorded, last one the untagged 0.
        assert len(result["tag_class_counts"]) == 4
        assert int(result["tag_class_counts"][-1]) == 0
        # TTA reported per tag level only.
        assert len(hist["eval_tag_pred_accuracy"]) >= 1
        # 4-digit semantic IDs in the diversity audit path.
        assert len(hist["codebook_usage"]) == 4

    def test_short_run_xxl_launch_surface(self, dataset_root, tmp_path):
        """Regression for the UNION of the 1M-corpus launch knobs: bf16
        device-resident data storage + k-means init + margin-gated duplicate
        mining, all at once (each knob has its own test elsewhere). No single
        shipped config enabled all three until h_rqvae_synthetic_xxl_m.gin
        (xxl's bf16 device data + xl4m2's margin-gated mining); this test
        pins that composition plus the superset of xxl/xl4m2."""
        from hidvae_tpu.train.hidvae import train

        result = train(
            iterations=4, batch_size=16, learning_rate=1e-3,
            dataset_folder=dataset_root, dataset=RecDataset.SYNTHETIC,
            save_dir_root=str(tmp_path / "out"),
            eval_every=4, save_model_every=4,
            vae_input_dim=TINY["feature_dim"], vae_n_cat_feats=0,
            vae_hidden_dims=(32, 16), vae_embed_dim=8,
            vae_codebook_size=32, vae_n_layers=4,
            tag_embed_dim=TINY["tag_dim"], rare_tag_threshold=3,
            eval_batches=2, log_every=2, make_plots=False,
            amp=True, device_data_dtype="bfloat16",
            use_kmeans_init=True, sem_id_mining=True,
            sem_id_mining_frac=0.25, sem_id_mining_margin=0.9,
            sem_id_mining_pool=64, id_repetition_threshold=1.0,
        )
        hist = result["history"]
        assert np.isfinite(hist["total_loss"]).all()
        assert len(hist["repetition_rate"]) >= 1

    def test_checkpoint_roundtrip(self, dataset_root, tmp_path):
        from hidvae_tpu.train.common import restore_checkpoint
        from hidvae_tpu.train.hidvae import train
        import jax.numpy as jnp

        result = train(
            iterations=2, batch_size=16, dataset_folder=dataset_root,
            dataset=RecDataset.SYNTHETIC, save_dir_root=str(tmp_path / "out"),
            eval_every=2, save_model_every=2, vae_input_dim=TINY["feature_dim"],
            vae_n_cat_feats=0, vae_hidden_dims=(32, 16), vae_embed_dim=8,
            vae_codebook_size=32, tag_embed_dim=TINY["tag_dim"],
            rare_tag_threshold=3, eval_batches=1, make_plots=False,
            do_eval=False,
        )
        path = result["saved_paths"][-1]
        state = result["state"]
        restored = restore_checkpoint(
            path,
            {"params": state.params, "batch_stats": state.batch_stats,
             "step": jnp.zeros((), jnp.int32)},
        )
        a = np.asarray(state.params["encoder"]["dense_0"]["kernel"])
        b = np.asarray(restored["params"]["encoder"]["dense_0"]["kernel"])
        np.testing.assert_array_equal(a, b)


class TestRqvaeTrainer:
    def test_short_run(self, dataset_root, tmp_path):
        from hidvae_tpu.train.rqvae import train

        result = train(
            iterations=4, batch_size=16, learning_rate=1e-3,
            dataset_folder=dataset_root, dataset=RecDataset.SYNTHETIC,
            save_dir_root=str(tmp_path / "out"),
            eval_every=4, save_model_every=4,
            vae_input_dim=TINY["feature_dim"], vae_n_cat_feats=0,
            vae_hidden_dims=(32, 16), vae_embed_dim=8, vae_codebook_size=32,
            use_dedup_dim=True, eval_batches=2, log_every=1, make_plots=False,
        )
        hist = result["history"]
        assert np.isfinite(hist["total_loss"]).all()
        assert hist["repetition_rate"], "diversity audit should have run"


class TestTransformerTrainer:
    def test_short_run(self, dataset_root, tmp_path):
        from hidvae_tpu.train.transformer import train

        result = train(
            iterations=3, batch_size=8, dataset_folder=dataset_root,
            dataset=RecDataset.SYNTHETIC, save_dir_root=str(tmp_path / "out"),
            partial_eval_every=3, full_eval_every=3, save_model_every=3,
            vae_input_dim=TINY["feature_dim"], vae_n_cat_feats=0,
            vae_hidden_dims=(32, 16), vae_embed_dim=8, vae_codebook_size=32,
            vae_n_layers=3, use_h_tokenizer=True, tag_embed_dim=TINY["tag_dim"],
            tag_class_counts=[4, 8, 16],
            decoder_embed_dim=16, attn_embed_dim=32, attn_heads=2, attn_layers=2,
            eval_batches=1, log_every=1, make_plots=False,
        )
        hist = result["history"]
        assert np.isfinite(hist["train_loss"]).all()
        assert hist["eval_loss"], "partial eval should have run"
        full = hist["full_eval_metrics"][-1]
        assert "h@10_slice_:3" in full
        assert "ndcg@10_slice_:3" in full
        assert all(0.0 <= v <= 1.0 for v in full.values())
        # Final test-split eval ran (target items[-1], ref data/amazon.py:65-91).
        assert hist["test_eval_metrics"] is not None
        assert "h@10_slice_:3" in hist["test_eval_metrics"]

    def test_short_run_concatenated_ids(self, dataset_root, tmp_path):
        """The reference's flagship Amazon layout: corpus IDs are
        [s1..sL, t1..tL] (use_concatenated_ids=True,
        ref configs/decoder_amazon.gin:32, h_semids.py:51-57)."""
        from hidvae_tpu.train.transformer import train

        result = train(
            iterations=3, batch_size=8, dataset_folder=dataset_root,
            dataset=RecDataset.SYNTHETIC, save_dir_root=str(tmp_path / "out"),
            partial_eval_every=3, full_eval_every=3, save_model_every=10,
            vae_input_dim=TINY["feature_dim"], vae_n_cat_feats=0,
            vae_hidden_dims=(32, 16), vae_embed_dim=8, vae_codebook_size=32,
            vae_n_layers=3, use_h_tokenizer=True, tag_embed_dim=TINY["tag_dim"],
            tag_class_counts=[4, 8, 16], use_concatenated_ids=True,
            decoder_embed_dim=16, attn_embed_dim=32, attn_heads=2, attn_layers=2,
            eval_batches=1, log_every=1, make_plots=False,
        )
        hist = result["history"]
        assert np.isfinite(hist["train_loss"]).all()
        full = hist["full_eval_metrics"][-1]
        # 6-digit IDs: per-position metrics go up to pos_5 / slice_:6.
        assert "h@10_slice_:6" in full
        assert "h@10_pos_5" in full
        assert hist["test_eval_metrics"] is not None

    def test_short_run_interleaved_ids(self, dataset_root, tmp_path):
        """KuaiRand's flagship layout: [s1,t1,s2,t2,s3,t3]
        (use_interleaved_ids=True, ref configs/decoder_kuairand.gin:25)."""
        from hidvae_tpu.train.transformer import train

        result = train(
            iterations=3, batch_size=8, dataset_folder=dataset_root,
            dataset=RecDataset.SYNTHETIC, save_dir_root=str(tmp_path / "out"),
            partial_eval_every=3, full_eval_every=3, save_model_every=10,
            vae_input_dim=TINY["feature_dim"], vae_n_cat_feats=0,
            vae_hidden_dims=(32, 16), vae_embed_dim=8, vae_codebook_size=32,
            vae_n_layers=3, use_h_tokenizer=True, tag_embed_dim=TINY["tag_dim"],
            tag_class_counts=[4, 8, 16], use_interleaved_ids=True,
            decoder_embed_dim=16, attn_embed_dim=32, attn_heads=2, attn_layers=2,
            eval_batches=1, log_every=1, make_plots=False,
        )
        hist = result["history"]
        assert np.isfinite(hist["train_loss"]).all()
        full = hist["full_eval_metrics"][-1]
        assert "h@10_slice_:6" in full
        assert hist["test_eval_metrics"] is not None

    def test_short_run_plain_tokenizer_dedup(self, dataset_root, tmp_path):
        """Plain SemanticIdTokenizer route (use_h_tokenizer=False) with the
        dedup rank column (ref call sites train_transformer.py:269,
        train_rqvae.py:321-323; module missing upstream, SURVEY §0.1)."""
        from hidvae_tpu.train.transformer import train

        result = train(
            iterations=3, batch_size=8, dataset_folder=dataset_root,
            dataset=RecDataset.SYNTHETIC, save_dir_root=str(tmp_path / "out"),
            partial_eval_every=3, full_eval_every=3, save_model_every=10,
            vae_input_dim=TINY["feature_dim"], vae_n_cat_feats=0,
            vae_hidden_dims=(32, 16), vae_embed_dim=8, vae_codebook_size=32,
            vae_n_layers=3, use_h_tokenizer=False, use_dedup_dim=True,
            decoder_embed_dim=16, attn_embed_dim=32, attn_heads=2, attn_layers=2,
            eval_batches=1, log_every=1, make_plots=False,
        )
        hist = result["history"]
        assert np.isfinite(hist["train_loss"]).all()
        full = hist["full_eval_metrics"][-1]
        # 3 semantic digits + 1 dedup rank digit.
        assert "h@10_slice_:4" in full
        assert hist["test_eval_metrics"] is not None

    def test_plain_tokenizer_ignores_interleaved_flag(self, dataset_root, tmp_path):
        """The reference's committed decoder_kuairand.gin combines
        use_h_tokenizer=False + use_dedup_dim=True + use_interleaved_ids=True;
        the plain route must ignore the interleaved flag (no tags to
        interleave) rather than embed the dedup digit as padding
        (PARITY.md deviation #12)."""
        from hidvae_tpu.train.transformer import train

        result = train(
            iterations=2, batch_size=8, dataset_folder=dataset_root,
            dataset=RecDataset.SYNTHETIC, save_dir_root=str(tmp_path / "out"),
            partial_eval_every=2, full_eval_every=2, save_model_every=10,
            vae_input_dim=TINY["feature_dim"], vae_n_cat_feats=0,
            vae_hidden_dims=(32, 16), vae_embed_dim=8, vae_codebook_size=32,
            vae_n_layers=3, use_h_tokenizer=False, use_dedup_dim=True,
            use_interleaved_ids=True,
            decoder_embed_dim=16, attn_embed_dim=32, attn_heads=2, attn_layers=2,
            eval_batches=1, log_every=1, make_plots=False,
        )
        hist = result["history"]
        assert np.isfinite(hist["train_loss"]).all()
        # Same 4-digit layout as the dedup run — interleaving changed nothing.
        assert "h@10_slice_:4" in hist["full_eval_metrics"][-1]

    def test_decoder_resume(self, dataset_root, tmp_path):
        """pretrained_decoder_path restores stage-2 weights (ref
        train_transformer.py:366-375)."""
        from hidvae_tpu.train.transformer import train

        common = dict(
            batch_size=8, dataset_folder=dataset_root,
            dataset=RecDataset.SYNTHETIC, save_dir_root=str(tmp_path / "out"),
            partial_eval_every=10_000, full_eval_every=10_000, save_model_every=2,
            vae_input_dim=TINY["feature_dim"], vae_n_cat_feats=0,
            vae_hidden_dims=(32, 16), vae_embed_dim=8, vae_codebook_size=32,
            vae_n_layers=3, use_h_tokenizer=True, tag_embed_dim=TINY["tag_dim"],
            tag_class_counts=[4, 8, 16],
            decoder_embed_dim=16, attn_embed_dim=32, attn_heads=2, attn_layers=2,
            eval_batches=1, log_every=1, make_plots=False,
        )
        r1 = train(iterations=2, **common)
        ckpt = r1["saved_paths"][-1]
        r2 = train(iterations=2, pretrained_decoder_path=ckpt, **common)
        a = np.asarray(r1["state"].params["out_proj"]["kernel"])
        # Resumed run starts from r1's weights, so after 2 more steps its
        # params differ from both fresh init and r1's end state but the run
        # must have loaded r1's checkpoint: verify by loading it directly.
        from hidvae_tpu.train.common import restore_checkpoint
        import jax.numpy as jnp

        restored = restore_checkpoint(
            ckpt, {"params": r1["state"].params, "step": jnp.zeros((), jnp.int32)}
        )
        np.testing.assert_array_equal(
            a, np.asarray(restored["params"]["out_proj"]["kernel"])
        )
        assert np.isfinite(r2["history"]["train_loss"]).all()


class TestServeFromArtifacts:
    def test_two_stage_handoff_to_engine(self, dataset_root, tmp_path):
        """The full deployment path: train stage 1, hand its checkpoint to
        stage 2, then rebuild the serving engine purely from the on-disk
        artifacts (gin config + two checkpoint dirs) and serve requests —
        the surface scripts/serve_demo.py drives in production."""
        from hidvae_tpu.serve import RetrievalEngine
        from hidvae_tpu.train.hidvae import train as train_s1
        from hidvae_tpu.train.transformer import train as train_s2

        s1 = train_s1(
            iterations=2, batch_size=16, dataset_folder=dataset_root,
            dataset=RecDataset.SYNTHETIC, save_dir_root=str(tmp_path / "s1"),
            eval_every=2, save_model_every=2, vae_input_dim=TINY["feature_dim"],
            vae_n_cat_feats=0, vae_hidden_dims=(32, 16), vae_embed_dim=8,
            vae_codebook_size=32, vae_n_layers=3,
            tag_embed_dim=TINY["tag_dim"], rare_tag_threshold=3,
            eval_batches=1, make_plots=False, do_eval=False,
        )
        s1_ckpt = s1["saved_paths"][-1]
        counts = list(s1["tag_class_counts"])

        s2 = train_s2(
            iterations=2, batch_size=8, dataset_folder=dataset_root,
            dataset=RecDataset.SYNTHETIC, save_dir_root=str(tmp_path / "s2"),
            partial_eval_every=10_000, full_eval_every=10_000,
            save_model_every=2, pretrained_rqvae_path=s1_ckpt,
            vae_input_dim=TINY["feature_dim"], vae_n_cat_feats=0,
            vae_hidden_dims=(32, 16), vae_embed_dim=8, vae_codebook_size=32,
            vae_n_layers=3, use_h_tokenizer=True, tag_embed_dim=TINY["tag_dim"],
            tag_class_counts=counts,
            decoder_embed_dim=16, attn_embed_dim=32, attn_heads=2, attn_layers=2,
            eval_batches=1, log_every=1, make_plots=False,
        )
        s2_ckpt = s2["saved_paths"][-1]

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

        engine = RetrievalEngine.from_artifacts(
            gin_path, s1_ckpt, s2_ckpt, batch_buckets=(4,),
        )
        assert engine.n_items == TINY["n_items"]
        hist = np.arange(6, dtype=np.int64).reshape(2, 3)
        out = engine.recommend(hist, top_k=5)
        assert out["items"].shape == (2, 5)
        assert (out["items"] >= 0).all() and (out["items"] < engine.n_items).all()
        # Generated tuples resolve to real corpus rows.
        corpus = np.asarray(engine.corpus_ids)
        np.testing.assert_array_equal(
            corpus[out["items"].reshape(-1)],
            out["sem_ids"].reshape(-1, engine.sem_id_dim),
        )

        # Stage-2 structural self-heal (VERDICT r2 weak #4): a gin with wrong
        # decoder geometry must NOT silently serve from random init — the
        # engine adopts the checkpoint's recorded structural config.
        bad_gin = str(tmp_path / "serve_bad.gin")
        with open(gin_path) as f:
            gin_text = f.read()
        with open(bad_gin, "w") as f:
            f.write(
                gin_text.replace("train.attn_heads = 2", "train.attn_heads = 4")
                .replace("train.attn_layers = 2", "train.attn_layers = 4")
                .replace("train.attn_embed_dim = 32", "train.attn_embed_dim = 64")
            )
        engine2 = RetrievalEngine.from_artifacts(
            bad_gin, s1_ckpt, s2_ckpt, batch_buckets=(4,),
        )
        assert engine2.model.num_heads == 2
        assert engine2.model.n_layers == 2
        assert engine2.model.attn_dim == 32
        out2 = engine2.recommend(hist, top_k=5)
        assert (out2["items"] >= 0).all()

        # And when the checkpoint predates the full meta (legacy
        # {attn_dim, sem_id_dim} only), the reconcile can't heal — the strict
        # lenient-restore must then fail loudly instead of serving garbage.
        import json as _json

        meta_path = os.path.join(s2_ckpt, "meta.json")
        with open(meta_path) as f:
            meta = _json.load(f)
        legacy = dict(meta)
        legacy["model_config"] = {
            "attn_dim": meta["model_config"]["attn_embed_dim"],
            "sem_id_dim": meta["model_config"]["sem_id_dim"],
        }
        with open(meta_path, "w") as f:
            _json.dump(legacy, f)
        try:
            with pytest.raises(ValueError, match="structurally incompatible"):
                RetrievalEngine.from_artifacts(
                    bad_gin, s1_ckpt, s2_ckpt, batch_buckets=(4,),
                )
        finally:
            with open(meta_path, "w") as f:
                _json.dump(meta, f)


class TestGinConfigs:
    def test_all_configs_parse(self):
        from hidvae_tpu.utils.ginlite import parse_gin_file

        import glob as g

        for path in g.glob("configs/*.gin"):
            cfg = parse_gin_file(path)
            assert "train" in cfg, path
            assert len(cfg["train"]) > 5, path

    def test_reference_config_values(self):
        from hidvae_tpu.models.quantize import QuantizeForwardMode
        from hidvae_tpu.utils.ginlite import parse_gin_file

        cfg = parse_gin_file("configs/h_rqvae_amazon.gin")["train"]
        assert cfg["vae_codebook_mode"] == QuantizeForwardMode.ROTATION_TRICK
        assert cfg["vae_hidden_dims"] == [512, 256, 128]
        assert cfg["tag_class_counts"] == [38, 168, 348]
        assert cfg["lr_scheduler_eta_min"] == 7e-8
        assert cfg["dataset"] == RecDataset.AMAZON

    def test_binding_known_params(self):
        from hidvae_tpu.utils.ginlite import bind_to_kwargs, parse_gin_file
        from hidvae_tpu.train.hidvae import train as hid_train

        cfg = parse_gin_file("configs/h_rqvae_amazon.gin")
        kwargs = bind_to_kwargs(cfg, "train", hid_train)
        assert kwargs["iterations"] == 400000
        assert kwargs["eval_tta"] is True
        assert kwargs["layer_specific_lr"] is True

    def test_unknown_binding_raises(self):
        """A typo'd hyperparameter must fail the run, matching gin-config's
        behavior (ref modules/utils.py:58-62), not silently train defaults."""
        from hidvae_tpu.utils.ginlite import bind_to_kwargs
        from hidvae_tpu.train.hidvae import train as hid_train

        cfg = {"train": {"iterations": 10, "learnign_rate": 1e-3}}  # typo
        with pytest.raises(ValueError, match="learnign_rate"):
            bind_to_kwargs(cfg, "train", hid_train)
        # Non-strict mode downgrades to a warning and still binds the rest.
        kwargs = bind_to_kwargs(cfg, "train", hid_train, strict=False)
        assert kwargs == {"iterations": 10}

    def test_all_configs_bind_strictly(self):
        """Every shipped config must bind cleanly to its trainer."""
        import glob as g

        from hidvae_tpu.utils.ginlite import bind_to_kwargs, parse_gin_file
        from hidvae_tpu.train.hidvae import train as hid_train
        from hidvae_tpu.train.rqvae import train as rq_train
        from hidvae_tpu.train.transformer import train as tf_train

        for path in sorted(g.glob("configs/*.gin")):
            name = os.path.basename(path)
            fn = (hid_train if name.startswith("h_rqvae")
                  else rq_train if name.startswith("rqvae") else tf_train)
            kwargs = bind_to_kwargs(parse_gin_file(path), "train", fn)
            assert kwargs, path
