"""Tests for the device-resident data pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from hidvae_tpu.train.device_data import (
    DeviceItemData,
    DeviceSeqData,
    random_crop_windows,
    tokenize_on_device,
)


class TestSampling:
    def test_item_sample_shapes(self):
        data = DeviceItemData(
            x=jnp.arange(40.0).reshape(10, 4),
            tags_emb=jnp.zeros((10, 3, 8)),
            tags_indices=jnp.zeros((10, 3), jnp.int32),
        )
        x, te, ti = data.sample(jax.random.key(0), 6)
        assert x.shape == (6, 4) and te.shape == (6, 3, 8) and ti.shape == (6, 3)

    def test_seq_sample_consistent_rows(self):
        data = DeviceSeqData(
            user_ids=jnp.arange(10, dtype=jnp.int32),
            items=jnp.tile(jnp.arange(10, dtype=jnp.int32)[:, None], (1, 5)),
            fut=jnp.arange(10, dtype=jnp.int32) * 100,
        )
        u, it, f = data.sample_rows(jax.random.key(1), 8)
        np.testing.assert_array_equal(np.asarray(it[:, 0]), np.asarray(u))
        np.testing.assert_array_equal(np.asarray(f), np.asarray(u) * 100)


class TestRandomCrop:
    def _row(self, hist, fut, n=8):
        items = np.full((1, n), -1, np.int32)
        items[0, : len(hist)] = hist
        return jnp.asarray(items), jnp.asarray([fut], jnp.int32)

    def test_window_is_contiguous_subsequence(self):
        hist = [10, 11, 12, 13, 14, 15]
        items, fut = self._row(hist, 16)
        full = hist + [16]
        for seed in range(20):
            ni, nf = random_crop_windows(jax.random.key(seed), items, fut)
            vals = [v for v in np.asarray(ni)[0] if v >= 0] + [int(nf[0])]
            assert len(vals) >= 3
            # Must be a contiguous subsequence of the full sequence.
            s = full.index(vals[0])
            assert full[s : s + len(vals)] == vals, (vals, full)

    def test_short_rows_unchanged(self):
        items, fut = self._row([5, 6], 7)
        ni, nf = random_crop_windows(jax.random.key(0), items, fut, min_len=3)
        np.testing.assert_array_equal(np.asarray(ni), np.asarray(items))
        assert int(nf[0]) == 7

    def test_targets_vary(self):
        items, fut = self._row([1, 2, 3, 4, 5, 6], 7)
        futs = {int(random_crop_windows(jax.random.key(s), items, fut)[1][0])
                for s in range(30)}
        assert len(futs) > 1

    def test_jittable(self):
        items, fut = self._row([1, 2, 3, 4], 5)
        f = jax.jit(random_crop_windows)
        ni, nf = f(jax.random.key(0), items, fut)
        assert ni.shape == items.shape


class TestTokenizeOnDevice:
    def test_matches_host_tokenizer_layout(self):
        cached = jnp.asarray(np.random.RandomState(0).randint(0, 9, (12, 3)), jnp.int32)
        items = jnp.asarray([[0, 1, -1], [2, 3, 4]], jnp.int32)
        fut = jnp.asarray([5, 6], jnp.int32)
        out = tokenize_on_device(cached, jnp.asarray([0, 1], jnp.int32), items, fut)
        assert out.sem_ids.shape == (2, 9)
        c = np.asarray(cached)
        np.testing.assert_array_equal(np.asarray(out.sem_ids)[0, :3], c[0])
        np.testing.assert_array_equal(np.asarray(out.sem_ids)[0, 3:6], c[1])
        np.testing.assert_array_equal(np.asarray(out.sem_ids)[0, 6:], [-1, -1, -1])
        np.testing.assert_array_equal(np.asarray(out.sem_ids_fut)[0], c[5])
        np.testing.assert_array_equal(
            np.asarray(out.token_type_ids)[0], [0, 1, 2] * 3
        )


class TestDuplicateMining:
    """Duplicate-pair mining (TPU-native extra): pools of colliding item
    pairs harvested from the corpus audit, sampled into every batch so the
    uniqueness loss sees guaranteed collisions at any corpus size."""

    def test_harvest_pairs_and_split_mapping(self):
        from hidvae_tpu.train.device_data import harvest_duplicate_pairs

        corpus = np.array([
            [1, 1], [2, 2], [1, 1], [3, 3], [2, 2], [1, 1], [4, 4],
        ], np.int32)
        # Items 0,2,5 collide on (1,1); 1,4 on (2,2).
        rng = np.random.RandomState(0)
        split = np.arange(7)  # all items in split
        pairs = harvest_duplicate_pairs(corpus, split, pool_size=64, np_rng=rng)
        assert pairs.shape == (64, 2)
        for a, b in pairs:
            np.testing.assert_array_equal(corpus[a], corpus[b])
            assert a != b

        # Drop item 5 from the split: its pairs must disappear and survivors
        # remap to split-local positions.
        split2 = np.array([0, 1, 2, 3, 4, 6])
        pairs2 = harvest_duplicate_pairs(corpus, split2, 64, np.random.RandomState(0))
        glob = split2[pairs2]  # back to global ids
        for a, b in glob:
            np.testing.assert_array_equal(corpus[a], corpus[b])
            assert 5 not in (a, b)

        # No duplicates -> None.
        uniq = np.arange(10, dtype=np.int32).reshape(5, 2)
        assert harvest_duplicate_pairs(uniq, np.arange(5), 8,
                                       np.random.RandomState(0)) is None

    def test_sample_places_pool_pairs_in_batch(self):
        from hidvae_tpu.train.device_data import DeviceItemData

        n, f = 50, 4
        x = jnp.arange(n * f, dtype=jnp.float32).reshape(n, f)
        pool = jnp.asarray([[3, 7], [11, 13]], jnp.int32)
        d = DeviceItemData(x=x, tags_emb=None, tags_indices=None,
                           mining_pairs=pool)
        xb, te, ti = d.sample(jax.random.key(0), batch_size=16, n_pair_rows=4)
        assert xb.shape == (16, f)
        # First 8 rows come as adjacent (pool-row) pairs.
        rows = np.asarray(xb[:8, 0]) / f  # recover item index from features
        pool_np = np.asarray(pool)
        for i in range(4):
            a, b = int(rows[2 * i]), int(rows[2 * i + 1])
            assert [a, b] in pool_np.tolist()
        # Without a pool the signature still works.
        d0 = DeviceItemData(x=x, tags_emb=None, tags_indices=None)
        xb0, _, _ = d0.sample(jax.random.key(0), 16, n_pair_rows=4)
        assert xb0.shape == (16, f)

    def test_trainer_smoke_with_mining(self, tmp_path):
        from hidvae_tpu.data.processed import RecDataset, processed_path
        from hidvae_tpu.data.synthetic import build_synthetic
        from hidvae_tpu.train.hidvae import train

        root = str(tmp_path / "data")
        arrays = build_synthetic(
            n_items=64, n_users=16, feature_dim=24, tag_dim=12,
            max_seq_len=8, min_seq_len=4, level_branching=(4, 2, 2), seed=0,
        )
        arrays.save(processed_path(root, RecDataset.SYNTHETIC))
        result = train(
            iterations=4, batch_size=16, dataset_folder=root,
            dataset=RecDataset.SYNTHETIC, save_dir_root=str(tmp_path / "out"),
            eval_every=2, save_model_every=100, eval_batches=1,
            vae_input_dim=24, vae_n_cat_feats=0, vae_hidden_dims=(16,),
            vae_embed_dim=8, vae_codebook_size=16, vae_n_layers=2,
            tag_embed_dim=12, rare_tag_threshold=2,
            use_kmeans_init=False, make_plots=False, eval_tta=False,
            sem_id_mining=True, sem_id_mining_frac=0.5, sem_id_mining_pool=32,
        )
        assert np.isfinite(result["history"]["total_loss"]).all()


class TestMinedPairLoss:
    """The mined-pair uniqueness term re-verifies collisions with an
    EVAL-mode ID pass (train-mode rotation-trick residuals give IDs that
    disagree with the audit — hrqvae.py __call__ docstring) and pushes the
    still-colliding pairs apart in encoder space."""

    def _model(self):
        from hidvae_tpu.models.hrqvae import HRqVae
        from hidvae_tpu.models.quantize import QuantizeForwardMode

        return HRqVae(
            input_dim=12, embed_dim=8, hidden_dims=(16,), codebook_size=8,
            n_layers=2, n_cat_features=0, tag_class_counts=[3, 3],
            tag_embed_dim=6,
            codebook_mode=QuantizeForwardMode.ROTATION_TRICK,
            sem_id_uniqueness_weight=2.0, sem_id_uniqueness_margin=0.0,
        )

    def _setup(self):
        model = self._model()
        rng = np.random.RandomState(0)
        # Rows 0,1 are an exact duplicate pair (same features -> same
        # eval-mode IDs at any params); rows 2,3 are a far-apart "pair".
        base = rng.randn(12)
        x = jnp.asarray(np.stack([base, base, rng.randn(12), -rng.randn(12)]
                                 + [rng.randn(12) for _ in range(4)]),
                        jnp.float32)
        te = jnp.asarray(rng.randn(8, 2, 6), jnp.float32)
        ti = jnp.zeros((8, 2), jnp.int32)
        variables = model.init(
            {"params": jax.random.key(0), "gumbel": jax.random.key(1),
             "dropout": jax.random.key(2), "mixup": jax.random.key(3)},
            x, te, ti, 0.2, train=False,
        )
        return model, variables, x, te, ti

    def _apply(self, model, variables, x, te, ti, n_mined_pairs):
        out, _ = model.apply(
            variables, x, te, ti, 0.2, train=True, n_mined_pairs=n_mined_pairs,
            rngs={"gumbel": jax.random.key(4), "dropout": jax.random.key(5),
                  "mixup": jax.random.key(6)},
            mutable=["batch_stats"],
        )
        return out

    def test_exact_duplicate_pair_detected_and_penalized(self):
        model, variables, x, te, ti = self._setup()
        out0 = self._apply(model, variables, x, te, ti, 0)
        out2 = self._apply(model, variables, x, te, ti, 2)
        # Pair (0,1) is an exact duplicate -> collides under eval-mode IDs.
        assert float(out2.mined_pair_collision_rate) >= 0.5
        assert float(out0.mined_pair_collision_rate) == 0.0
        # cos(enc, enc) = 1 on the duplicate pair -> penalty ~1 over margin 0;
        # the term is weighted into sem_id_uniqueness_loss (and the total).
        assert float(out2.sem_id_uniqueness_loss) > float(
            out0.sem_id_uniqueness_loss) + 0.5
        assert float(out2.loss) > float(out0.loss)

    def test_gradient_flows_to_encoder(self):
        model, variables, x, te, ti = self._setup()

        def mined_only(params):
            out, _ = model.apply(
                {**variables, "params": params}, x, te, ti, 0.2, train=True,
                n_mined_pairs=2,
                rngs={"gumbel": jax.random.key(4),
                      "dropout": jax.random.key(5),
                      "mixup": jax.random.key(6)},
                mutable=["batch_stats"],
            )
            return out.sem_id_uniqueness_loss

        g = jax.grad(mined_only)(variables["params"])
        enc_norm = sum(
            float(jnp.abs(l).sum())
            for l in jax.tree_util.tree_leaves(g["encoder"])
        )
        assert enc_norm > 0.0


class TestMinedLossIsolation:
    """mined_loss_isolation=True (round-5 ablation knob): mined rows feed ONLY
    the pair penalty — recon / quantize / tag losses must equal a plain
    forward over the uniform rows alone, removing the batch-composition shift
    that margin-insensitively cost ~10pp eval tag accuracy at 200k items
    (BASELINE.md mining-line summary)."""

    def _models_and_data(self):
        import dataclasses

        from hidvae_tpu.models.hrqvae import HRqVae
        from hidvae_tpu.models.quantize import QuantizeForwardMode

        base = HRqVae(
            input_dim=12, embed_dim=8, hidden_dims=(16,), codebook_size=8,
            n_layers=2, n_cat_features=0, tag_class_counts=[3, 3],
            tag_embed_dim=6,
            codebook_mode=QuantizeForwardMode.ROTATION_TRICK,
            sem_id_uniqueness_weight=2.0, sem_id_uniqueness_margin=0.0,
        )
        iso = dataclasses.replace(base, mined_loss_isolation=True)
        rng = np.random.RandomState(0)
        row = rng.randn(12)
        x = jnp.asarray(
            np.stack([row, row, rng.randn(12), -rng.randn(12)]
                     + [rng.randn(12) for _ in range(4)]), jnp.float32)
        te = jnp.asarray(rng.randn(8, 2, 6), jnp.float32)
        ti = jnp.zeros((8, 2), jnp.int32)
        variables = base.init(
            {"params": jax.random.key(0), "gumbel": jax.random.key(1),
             "dropout": jax.random.key(2), "mixup": jax.random.key(3)},
            x, te, ti, 0.2, train=False,
        )
        return base, iso, variables, x, te, ti

    def test_non_uniqueness_losses_see_only_uniform_rows(self):
        base, iso, variables, x, te, ti = self._models_and_data()
        # Eval-mode forwards: deterministic (no dropout/mixup), BN running
        # stats -> per-row outputs independent of batch composition.
        out_iso = iso.apply(variables, x, te, ti, 0.2, train=False,
                            n_mined_pairs=2)
        out_main = base.apply(variables, x[4:], te[4:], ti[4:], 0.2,
                              train=False, n_mined_pairs=0)
        np.testing.assert_allclose(
            float(out_iso.reconstruction_loss),
            float(out_main.reconstruction_loss), rtol=1e-6)
        np.testing.assert_allclose(
            float(out_iso.rqvae_loss), float(out_main.rqvae_loss), rtol=1e-6)
        np.testing.assert_allclose(
            float(out_iso.tag_pred_loss), float(out_main.tag_pred_loss),
            rtol=1e-6)
        np.testing.assert_allclose(
            float(out_iso.tag_align_loss), float(out_main.tag_align_loss),
            rtol=1e-6)
        # The mined duplicate pair (rows 0,1) is still detected and penalized.
        assert float(out_iso.mined_pair_collision_rate) >= 0.5
        assert float(out_iso.sem_id_uniqueness_loss) > float(
            out_main.sem_id_uniqueness_loss) + 0.5

    def test_without_isolation_mined_rows_shift_losses(self):
        base, _, variables, x, te, ti = self._models_and_data()
        out_full = base.apply(variables, x, te, ti, 0.2, train=False,
                              n_mined_pairs=2)
        out_main = base.apply(variables, x[4:], te[4:], ti[4:], 0.2,
                              train=False, n_mined_pairs=0)
        # Control: with isolation OFF the duplicated rows change recon loss.
        assert abs(float(out_full.reconstruction_loss)
                   - float(out_main.reconstruction_loss)) > 1e-6
