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
