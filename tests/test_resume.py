"""Resume-equivalence tests: train 2N steps == train N, save, restore, train N.

The reference checkpoints {iter, model, optimizer} (train_rqvae.py:302-313)
and stage 2 additionally restores the scheduler (train_transformer.py:366-375,
823-835). Here the full TrainState — params, batch_stats, opt_state (incl.
MultiSteps accumulator and schedule counts) — round-trips through Orbax, and
per-step randomness is a pure function of (seed, global step), so a resumed
run must reproduce the uninterrupted run bit-for-bit.
"""

import jax
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
    root = str(tmp_path_factory.mktemp("synth_resume"))
    arrays = build_synthetic(**TINY)
    arrays.save(processed_path(root, RecDataset.SYNTHETIC))
    return root


def _assert_states_equal(state_a, state_b, rtol=1e-6, atol=1e-7):
    leaves_a = jax.tree_util.tree_leaves(
        {"params": state_a.params, "opt_state": state_a.opt_state}
    )
    leaves_b = jax.tree_util.tree_leaves(
        {"params": state_b.params, "opt_state": state_b.opt_state}
    )
    assert len(leaves_a) == len(leaves_b)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=rtol, atol=atol
        )
    assert int(state_a.step) == int(state_b.step)


def _opt_state_nontrivial(state):
    """The restored Adam moments must not all be zero (would indicate a
    silent params-only restore)."""
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(state.opt_state):
        total += float(np.abs(np.asarray(leaf, np.float64)).sum())
    return total > 0.0


class TestHidvaeResume:
    def test_resume_equivalence(self, dataset_root, tmp_path):
        from hidvae_tpu.train.hidvae import train

        common = dict(
            batch_size=16, learning_rate=1e-3, dataset_folder=dataset_root,
            dataset=RecDataset.SYNTHETIC,
            eval_every=10_000, do_eval=False,
            vae_input_dim=TINY["feature_dim"], vae_n_cat_feats=0,
            vae_hidden_dims=(32, 16), vae_embed_dim=8, vae_codebook_size=32,
            vae_n_layers=3, tag_embed_dim=TINY["tag_dim"], rare_tag_threshold=3,
            gradient_accumulate_every=2,  # covers the MultiSteps accumulator
            use_lr_scheduler=True, lr_scheduler_type="cosine",
            lr_scheduler_T_max=16,
            log_every=2, make_plots=False, seed=7,
        )
        full = train(iterations=4, save_model_every=10_000,
                     save_dir_root=str(tmp_path / "full"), **common)

        half = train(iterations=2, save_model_every=10_000,
                     save_dir_root=str(tmp_path / "half"), **common)
        ckpt = half["saved_paths"][-1]
        resumed = train(iterations=2, save_model_every=10_000,
                        save_dir_root=str(tmp_path / "resumed"),
                        pretrained_hrqvae_path=ckpt, **common)

        assert _opt_state_nontrivial(resumed["state"])
        _assert_states_equal(full["state"], resumed["state"])


class TestHidvaeMiningResume:
    def test_mining_pool_resume_equivalence(self, dataset_root, tmp_path):
        """A duplicate-mining run restores its harvested pool from the
        checkpoint (PARITY #18): train 4 == train 2 / save / restore / train 2,
        bit-for-bit, across an audit boundary. The pool rides the checkpoint's
        arrays payload, and the audit harvest is seeded by (seed, audit step)
        so both runs re-harvest identically at step 2 and 4."""
        import orbax.checkpoint as ocp

        from hidvae_tpu.train.hidvae import train

        common = dict(
            batch_size=16, learning_rate=1e-3, dataset_folder=dataset_root,
            dataset=RecDataset.SYNTHETIC,
            eval_every=2, do_eval=True, eval_batches=1,
            id_repetition_threshold=0.0,  # never gate-save in this test
            sem_id_mining=True, sem_id_mining_frac=0.25,
            sem_id_mining_pool=16, sem_id_mining_margin=0.9,
            vae_input_dim=TINY["feature_dim"], vae_n_cat_feats=0,
            vae_hidden_dims=(32, 16), vae_embed_dim=8, vae_codebook_size=32,
            vae_n_layers=3, tag_embed_dim=TINY["tag_dim"], rare_tag_threshold=3,
            log_every=2, make_plots=False, seed=7,
        )
        full = train(iterations=4, save_model_every=2,
                     save_dir_root=str(tmp_path / "full"), **common)
        half = train(iterations=2, save_model_every=2,
                     save_dir_root=str(tmp_path / "half"), **common)
        ckpt = half["saved_paths"][-1]
        # The checkpoint carries the pool.
        with ocp.PyTreeCheckpointer() as ckptr:
            assert "mining_pairs" in ckptr.restore(ckpt)
        resumed = train(iterations=2, save_model_every=2,
                        save_dir_root=str(tmp_path / "resumed"),
                        pretrained_hrqvae_path=ckpt, **common)

        assert _opt_state_nontrivial(resumed["state"])
        _assert_states_equal(full["state"], resumed["state"])

        # The final saved pools agree too (same post-audit harvest at step 4).
        with ocp.PyTreeCheckpointer() as ckptr:
            pool_full = np.asarray(
                ckptr.restore(full["saved_paths"][-1])["mining_pairs"])
            pool_resumed = np.asarray(
                ckptr.restore(resumed["saved_paths"][-1])["mining_pairs"])
        np.testing.assert_array_equal(pool_full, pool_resumed)

    def test_pre_persistence_checkpoint_reseeds(self, dataset_root, tmp_path):
        """A mining run restoring a checkpoint saved WITHOUT a pool (mining
        off, e.g. pre-round-5 checkpoints) must fall back to the uniform seed
        instead of training against the -1 sentinel."""
        from hidvae_tpu.train.hidvae import train

        common = dict(
            batch_size=16, learning_rate=1e-3, dataset_folder=dataset_root,
            dataset=RecDataset.SYNTHETIC,
            eval_every=10_000, do_eval=False,
            vae_input_dim=TINY["feature_dim"], vae_n_cat_feats=0,
            vae_hidden_dims=(32, 16), vae_embed_dim=8, vae_codebook_size=32,
            vae_n_layers=3, tag_embed_dim=TINY["tag_dim"], rare_tag_threshold=3,
            log_every=2, make_plots=False, seed=7,
        )
        plain = train(iterations=2, save_model_every=2,
                      save_dir_root=str(tmp_path / "plain"), **common)
        resumed = train(iterations=2, save_model_every=10_000,
                        save_dir_root=str(tmp_path / "resumed"),
                        pretrained_hrqvae_path=plain["saved_paths"][-1],
                        sem_id_mining=True, sem_id_mining_frac=0.25,
                        sem_id_mining_pool=16, **common)
        assert np.isfinite(resumed["history"]["total_loss"]).all()


class TestRqvaeResume:
    def test_resume_equivalence(self, dataset_root, tmp_path):
        from hidvae_tpu.train.rqvae import train

        common = dict(
            batch_size=16, learning_rate=1e-3, dataset_folder=dataset_root,
            dataset=RecDataset.SYNTHETIC,
            eval_every=10_000, do_eval=False,
            vae_input_dim=TINY["feature_dim"], vae_n_cat_feats=0,
            vae_hidden_dims=(32, 16), vae_embed_dim=8, vae_codebook_size=32,
            log_every=2, make_plots=False, seed=7,
        )
        full = train(iterations=4, save_model_every=10_000,
                     save_dir_root=str(tmp_path / "full"), **common)
        half = train(iterations=2, save_model_every=10_000,
                     save_dir_root=str(tmp_path / "half"), **common)
        resumed = train(iterations=2, save_model_every=10_000,
                        save_dir_root=str(tmp_path / "resumed"),
                        pretrained_rqvae_path=half["saved_paths"][-1], **common)

        assert _opt_state_nontrivial(resumed["state"])
        _assert_states_equal(full["state"], resumed["state"])


class TestTransformerResume:
    def test_resume_equivalence(self, dataset_root, tmp_path):
        from hidvae_tpu.train.transformer import train

        common = dict(
            batch_size=8, dataset_folder=dataset_root,
            dataset=RecDataset.SYNTHETIC,
            partial_eval_every=10_000, full_eval_every=10_000,
            vae_input_dim=TINY["feature_dim"], vae_n_cat_feats=0,
            vae_hidden_dims=(32, 16), vae_embed_dim=8, vae_codebook_size=32,
            vae_n_layers=3, use_h_tokenizer=True, tag_embed_dim=TINY["tag_dim"],
            tag_class_counts=[4, 8, 16],
            decoder_embed_dim=16, attn_embed_dim=32, attn_heads=2,
            attn_layers=2, warmup_steps=3,  # inv-sqrt schedule count must resume
            log_every=2, make_plots=False, seed=7,
        )
        full = train(iterations=4, save_model_every=10_000,
                     save_dir_root=str(tmp_path / "full"), **common)
        half = train(iterations=2, save_model_every=10_000,
                     save_dir_root=str(tmp_path / "half"), **common)
        resumed = train(iterations=2, save_model_every=10_000,
                        save_dir_root=str(tmp_path / "resumed"),
                        pretrained_decoder_path=half["saved_paths"][-1], **common)

        assert _opt_state_nontrivial(resumed["state"])
        _assert_states_equal(full["state"], resumed["state"])
