"""Hierarchically-supervised RQ-VAE (HiD-VAE core model).

Parity: reference modules/h_rqvae.py (HRqVae, TagPredictor,
SemanticIdUniquenessLoss). Everything in RqVae plus, per quantization level i:
  * concat_emb = concat(embs[0..i])  of dim (i+1)*embed_dim  (ref :303, :526)
  * tag projector: Linear -> BatchNorm -> ReLU -> Dropout -> Linear -> LayerNorm
    projecting the level's ground-truth tag embedding (ref :322-331)
  * InfoNCE tag-alignment loss between concat_emb and projected tag (ref :538)
  * TagPredictor classification head + tag-prediction loss (ref :543-547)
plus a batch-pairwise semantic-ID uniqueness loss on colliding ID tuples
(ref :25-105, :630-631).

Loss-weighting parity note: the reference applies `tag_alignment_weight` twice
(inside TagAlignmentLoss AND in the total, h_rqvae.py:353-356 + :637) and
`sem_id_uniqueness_weight` twice (inside the loss AND in the total, :366-369 +
:639). We reproduce that exactly so the published gin hyperparameters
(configs/h_rqvae_amazon.gin) train identically.

Focal parity note: the reference computes per-layer focal params
(train_hidvae.py:347-351) but calls the loss without layer_idx
(h_rqvae.py:544), so layer-0 params apply everywhere. We follow the written
intent and pass the real layer index (configurable via
`focal_per_layer_schedule`).
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct

from hidvae_tpu.models.layers import MLP
from hidvae_tpu.models.losses import (
    categorical_reconstruction_loss,
    reconstruction_loss,
    tag_alignment_loss,
    tag_prediction_loss,
    uniqueness_loss,
)
from hidvae_tpu.models.quantize import Quantize, QuantizeForwardMode
from hidvae_tpu.models.rqvae import p_unique_ids_stat
from hidvae_tpu.ops.distances import DistanceMode
from hidvae_tpu.ops.normalize import l2norm


@struct.dataclass
class HRqVaeOutput:
    embeddings: jax.Array        # [B, L, D]
    residuals: jax.Array         # [B, L, D]
    sem_ids: jax.Array           # [B, L]
    quantize_loss: jax.Array     # [B]
    tag_align_loss: jax.Array    # scalar (layer mean)
    tag_pred_loss: jax.Array     # scalar (layer mean)
    tag_pred_accuracy: jax.Array  # scalar (layer mean)
    tag_align_loss_by_layer: Optional[jax.Array] = None   # [L]
    tag_pred_loss_by_layer: Optional[jax.Array] = None    # [L]
    tag_pred_accuracy_by_layer: Optional[jax.Array] = None  # [L]


@struct.dataclass
class HRqVaeComputedLosses:
    loss: jax.Array
    reconstruction_loss: jax.Array
    rqvae_loss: jax.Array
    tag_align_loss: jax.Array
    tag_pred_loss: jax.Array
    tag_pred_accuracy: jax.Array
    embs_norm: jax.Array
    p_unique_ids: jax.Array
    tag_align_loss_by_layer: Optional[jax.Array] = None
    tag_pred_loss_by_layer: Optional[jax.Array] = None
    tag_pred_accuracy_by_layer: Optional[jax.Array] = None
    sem_id_uniqueness_loss: Optional[jax.Array] = None
    mined_pair_collision_rate: Optional[jax.Array] = None


class TagPredictor(nn.Module):
    """Per-level tag classification head (ref h_rqvae.py:108-227).

    Sigmoid attention gate -> (optional L2 norm for deeper layers) -> feature
    extractor -> two residual blocks -> classifier MLP. Dropout rate grows with
    layer index, capped at 0.55 (ref :129).
    """

    embed_dim: int
    num_classes: int
    hidden_dim: Optional[int] = None
    dropout_rate: float = 0.2
    use_batch_norm: bool = True  # maps to LayerNorm inside (as the reference does)
    layer_idx: int = 0
    dtype: jnp.dtype = jnp.float32  # matmul compute dtype (AMP); norms stay fp32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.embed_dim
        hidden = self.hidden_dim if self.hidden_dim is not None else 2 * d
        mid = int(hidden * 0.9)
        drop = min(0.55, self.dropout_rate + self.layer_idx * 0.075)

        def dense(features, name):
            return nn.Dense(features, name=name, dtype=self.dtype)

        def maybe_norm(h, name):
            return nn.LayerNorm(name=name)(h) if self.use_batch_norm else h

        def dropout(h, rate):
            return nn.Dropout(rate, deterministic=not train)(h)

        # Attention gate (ref :132-139).
        a = dense(d // 4, "attn_0")(x)
        a = nn.relu(a)
        a = dense(d // 2, "attn_1")(a)
        a = nn.gelu(a)
        a = dense(d, "attn_2")(a)
        gate = nn.sigmoid(a)
        h = x * gate
        if self.layer_idx > 0:  # feature normalization for deeper layers (ref :194)
            h = l2norm(h, axis=-1)

        # Feature extraction (ref :143-148).
        h = dense(hidden, "feat")(h)
        h = maybe_norm(h, "feat_ln")
        h = nn.relu(h)
        h = dropout(h, drop)

        # Residual blocks (ref :154-175).
        for blk in range(2):
            r = dense(mid, f"res{blk}_0")(h)
            r = maybe_norm(r, f"res{blk}_ln0")
            r = nn.relu(r)
            r = dropout(r, drop)
            r = dense(hidden, f"res{blk}_1")(r)
            r = nn.relu(r)
            r = dropout(r, drop)
            r = maybe_norm(r, f"res{blk}_ln1")
            h = h + r

        # Classifier (ref :179-188).
        c = dense(mid, "cls_0")(h)
        c = maybe_norm(c, "cls_ln")
        c = nn.relu(c)
        c = dropout(c, drop)
        c = dense(mid // 2, "cls_1")(c)
        c = nn.relu(c)
        c = dropout(c, drop * 0.5)
        # Logits in fp32: the focal/CE losses are precision-sensitive.
        return dense(self.num_classes, "cls_out")(c).astype(jnp.float32)


class TagProjector(nn.Module):
    """Projects a 768-d tag embedding to the level's concat dim (ref h_rqvae.py:322-331)."""

    hidden_dim: int
    out_dim: int
    dropout_rate: float = 0.2
    use_batch_norm: bool = True
    use_layer_norm: bool = False  # tied to codebook_normalize in the reference
    dtype: jnp.dtype = jnp.float32  # matmul compute dtype (AMP); norms stay fp32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Dense(self.hidden_dim, name="dense_0", dtype=self.dtype)(x)
        if self.use_batch_norm:
            h = nn.BatchNorm(use_running_average=not train, name="bn")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = nn.Dense(self.out_dim, name="dense_1", dtype=self.dtype)(h)
        if self.use_layer_norm:
            h = nn.LayerNorm(name="ln")(h)
        # Projected tag embedding feeds the InfoNCE alignment loss in fp32.
        return h.astype(jnp.float32)


class HRqVae(nn.Module):
    """HiD-VAE core model (ref modules/h_rqvae.py:230-757)."""

    input_dim: int
    embed_dim: int
    hidden_dims: Sequence[int]
    codebook_size: int
    codebook_normalize: bool = False
    codebook_sim_vq: bool = False
    codebook_mode: QuantizeForwardMode = QuantizeForwardMode.GUMBEL_SOFTMAX
    codebook_distance: DistanceMode = DistanceMode.L2
    n_layers: int = 3
    commitment_weight: float = 0.25
    n_cat_features: int = 18
    tag_alignment_weight: float = 0.5
    tag_prediction_weight: float = 0.5
    tag_class_counts: Optional[Sequence[int]] = None
    tag_embed_dim: int = 768
    use_focal_loss: bool = False
    focal_gamma_base: float = 2.0
    focal_alpha_base: float = 0.25
    focal_per_layer_schedule: bool = True
    dropout_rate: float = 0.2
    use_batch_norm: bool = True
    alignment_temperature: float = 0.1
    sem_id_uniqueness_weight: float = 0.5
    sem_id_uniqueness_margin: float = 0.5
    # Margin for the mined-pair term only (PARITY #18). None -> reuse
    # sem_id_uniqueness_margin. A high margin (e.g. 0.9) pushes a colliding
    # pair just far enough to cross fine-level codebook cell boundaries
    # instead of driving cos to <= 0 — measured: margin 0.0 cuts 200k-corpus
    # repetition (0.167 -> ~0.13) but costs ~10pp eval tag accuracy from the
    # over-separation (BASELINE.md XL mining row).
    sem_id_mining_margin: Optional[float] = None
    # Loss isolation for mined rows (PARITY #18, round-5 ablation): when True,
    # the first 2*n_mined_pairs rows contribute ONLY to the mined-pair
    # uniqueness penalty — recon / quantize / tag losses and the in-batch
    # uniqueness term are computed on the remaining (uniformly sampled) rows.
    # Motivation (measured): mining's ~10pp eval-tag-accuracy cost was
    # margin-INsensitive (0.657 @ margin 0 vs 0.668 @ margin 0.9), pointing at
    # batch-composition shift — mined rows replace 25% of the uniform batch,
    # oversampling duplicate-dense cluster cores in every tag/recon gradient —
    # rather than over-separation. Isolation restores a uniform training
    # distribution for all non-uniqueness losses.
    mined_loss_isolation: bool = False
    use_label_smoothing: bool = True
    label_smoothing_alpha: float = 0.1
    use_mixup: bool = True
    mixup_alpha: float = 0.2
    # AMP compute dtype for the MLP/tag-head matmuls (ref train_hidvae.py:77-80
    # Accelerate autocast). The quantizer distance/argmin path and all losses
    # stay fp32 so train/eval/Pallas-kernel ID assignments agree exactly.
    dtype: jnp.dtype = jnp.float32

    @property
    def resolved_tag_class_counts(self):
        if self.tag_class_counts is None:
            return [10, 100, 1000][: self.n_layers]  # ref h_rqvae.py:279-283
        counts = list(self.tag_class_counts)[: self.n_layers]
        # Trailing non-positive counts mark untagged levels: when n_layers
        # exceeds the dataset's tag depth the trainer pads tags with -1 and
        # derives a 0 class count for the extra levels (train/hidvae.py:335,
        # train/tags.py::reconcile_tag_layers) — those levels quantize the
        # residual with no tag head (a zero-class head would be a zero-width
        # Dense and crash the initializer).
        while counts and int(counts[-1]) <= 0:
            counts.pop()
        return counts

    @property
    def n_tag_levels(self):
        """Number of tag-supervised quantization levels. The reference couples
        quantizer depth to tag depth 1:1 (its datasets all have exactly three
        tag levels and n_layers=3, ref h_rqvae.py:279-283); here n_layers may
        exceed the tag depth — extra levels quantize the residual without tag
        supervision, which is how the ID space scales to catalogs larger than
        the tag hierarchy is deep (e.g. 200k items needs a 4th level to hold
        semantic-ID repetition down; see BASELINE.md XL table)."""
        return min(self.n_layers, len(self.resolved_tag_class_counts))

    @property
    def concat_embed_dims(self):
        return [(self.embed_dim * (i + 1)) for i in range(self.n_layers)]

    def setup(self):
        counts = self.resolved_tag_class_counts
        assert len(counts) == self.n_tag_levels
        self.layers = [
            Quantize(
                embed_dim=self.embed_dim,
                n_embed=self.codebook_size,
                forward_mode=self.codebook_mode,
                distance_mode=self.codebook_distance,
                codebook_normalize=(i == 0 and self.codebook_normalize),
                sim_vq=self.codebook_sim_vq,
                commitment_weight=self.commitment_weight,
                name=f"quantize_{i}",
            )
            for i in range(self.n_layers)
        ]
        self.tag_predictors = [
            TagPredictor(
                embed_dim=self.concat_embed_dims[i],
                num_classes=counts[i],
                hidden_dim=self.hidden_dims[0] // 2 * (i + 1),  # ref :314
                dropout_rate=self.dropout_rate,
                use_batch_norm=self.use_batch_norm,
                layer_idx=i,
                dtype=self.dtype,
                name=f"tag_predictor_{i}",
            )
            for i in range(self.n_tag_levels)
        ]
        self.tag_projectors = [
            TagProjector(
                hidden_dim=self.hidden_dims[0],
                out_dim=self.concat_embed_dims[i],
                dropout_rate=self.dropout_rate,
                use_batch_norm=self.use_batch_norm,
                use_layer_norm=self.codebook_normalize,
                dtype=self.dtype,
                name=f"tag_projector_{i}",
            )
            for i in range(self.n_tag_levels)
        ]
        self.encoder = MLP(
            hidden_dims=self.hidden_dims,
            out_dim=self.embed_dim,
            normalize=self.codebook_normalize,
            dtype=self.dtype,
            name="encoder",
        )
        self.decoder = MLP(
            hidden_dims=list(self.hidden_dims)[::-1],
            out_dim=self.input_dim,
            normalize=True,
            dtype=self.dtype,
            name="decoder",
        )

    def encode(self, x):
        # fp32 into the quantizer: the distance argmin must agree between
        # train / eval / the Pallas corpus-sweep kernel.
        return self.encoder(x).astype(jnp.float32)

    def decode(self, x):
        return self.decoder(x)

    def stacked_codebooks(self):
        """Effective per-level codebooks [L, K, D] (post SimVQ/normalize)."""
        return jnp.stack([layer.codebook() for layer in self.layers])

    def predict_tags_from_ids(self, ids):
        """Tag predictions given precomputed semantic IDs [B, L] — used by the
        fused corpus sweep so the quantize cascade isn't recomputed
        (capability of ref predict_tags, h_rqvae.py:674-738, minus the
        redundant re-quantization)."""
        cbs = self.stacked_codebooks()          # [L, K, D]
        embs = []
        preds, confs = [], []
        for i in range(self.n_tag_levels):
            embs.append(jnp.take(cbs[i], ids[:, i], axis=0))
            concat = jnp.concatenate(embs, axis=-1)
            logits = self.tag_predictors[i](concat, train=False)
            probs = jax.nn.softmax(logits, axis=-1)
            preds.append(jnp.argmax(probs, axis=-1).astype(jnp.int32))
            confs.append(jnp.max(probs, axis=-1))
        return {
            "predictions": jnp.stack(preds, axis=-1),
            "confidences": jnp.stack(confs, axis=-1),
        }

    def _focal_params_for_layer(self, i: int):
        """Per-layer focal base params (train_hidvae.py:347-351)."""
        if self.focal_per_layer_schedule:
            gamma = self.focal_gamma_base * (1.0 + i * 0.5)
            alpha = max(0.05, self.focal_alpha_base - i * 0.05)
            return gamma, alpha, i
        return self.focal_gamma_base, self.focal_alpha_base, 0

    def get_semantic_ids(
        self,
        encoded_x,
        tags_emb=None,
        tags_indices=None,
        gumbel_t: float = 0.001,
        train: bool = False,
        class_counts: Optional[Sequence[jax.Array]] = None,
    ) -> HRqVaeOutput:
        """Residual quantization with per-level tag supervision (ref h_rqvae.py:481-583)."""
        res = encoded_x
        has_tags = tags_emb is not None and tags_indices is not None
        embs, sem_ids, residuals = [], [], []
        q_loss = 0.0
        align_by_layer, pred_by_layer, acc_by_layer = [], [], []

        for i, layer in enumerate(self.layers):
            residuals.append(res)
            out = layer(res, temperature=gumbel_t, train=train)
            q_loss = q_loss + out.loss
            embs.append(out.embeddings)
            sem_ids.append(out.ids)
            concat_emb = jnp.concatenate(embs, axis=-1)  # [B, (i+1)*D]

            if has_tags and i < self.n_tag_levels:
                cur_tag_emb = tags_emb[:, i]
                cur_tag_idx = tags_indices[:, i]
                projected = self.tag_projectors[i](cur_tag_emb, train=train)
                align = tag_alignment_loss(
                    concat_emb,
                    projected,
                    layer_idx=i,
                    alignment_weight=self.tag_alignment_weight,
                    temperature=self.alignment_temperature,
                )
                align_by_layer.append(align)

                logits = self.tag_predictors[i](concat_emb, train=train)
                gamma, alpha, loss_layer_idx = self._focal_params_for_layer(i)
                mixup_rng = (
                    self.make_rng("mixup") if (train and self.use_mixup) else None
                )
                pred = tag_prediction_loss(
                    logits,
                    cur_tag_idx,
                    layer_idx=loss_layer_idx,
                    use_focal_loss=self.use_focal_loss,
                    focal_gamma=gamma,
                    focal_alpha=alpha,
                    class_counts=None if class_counts is None else class_counts[i],
                    use_label_smoothing=self.use_label_smoothing,
                    label_smoothing_alpha=self.label_smoothing_alpha,
                    use_mixup=self.use_mixup,
                    mixup_alpha=self.mixup_alpha,
                    rng=mixup_rng,
                    training=train,
                )
                pred_by_layer.append(pred.loss)
                acc_by_layer.append(pred.accuracy)

            res = res - out.embeddings

        if has_tags:
            align_stack = jnp.stack(align_by_layer)
            pred_stack = jnp.stack(pred_by_layer)
            acc_stack = jnp.stack(acc_by_layer)
            # Mean over tag-supervised levels (== n_layers when coupled 1:1,
            # the reference's only case — ref h_rqvae.py:561-565).
            tag_align = jnp.sum(align_stack) / self.n_tag_levels
            tag_pred = jnp.sum(pred_stack) / self.n_tag_levels
            tag_acc = jnp.sum(acc_stack) / self.n_tag_levels
        else:
            align_stack = pred_stack = acc_stack = None
            tag_align = tag_pred = tag_acc = jnp.float32(0.0)

        return HRqVaeOutput(
            embeddings=jnp.stack(embs, axis=-2),
            residuals=jnp.stack(residuals, axis=-2),
            sem_ids=jnp.stack(sem_ids, axis=-1),
            quantize_loss=q_loss,
            tag_align_loss=tag_align,
            tag_pred_loss=tag_pred,
            tag_pred_accuracy=tag_acc,
            tag_align_loss_by_layer=align_stack,
            tag_pred_loss_by_layer=pred_stack,
            tag_pred_accuracy_by_layer=acc_stack,
        )

    def reconstruct(self, embeddings_sum):
        x_hat = self.decode(embeddings_sum)
        if self.n_cat_features > 0:
            x_hat = jnp.concatenate(
                [
                    l2norm(x_hat[..., : -self.n_cat_features], axis=-1),
                    x_hat[..., -self.n_cat_features:],
                ],
                axis=-1,
            )
        else:
            x_hat = l2norm(x_hat, axis=-1)
        return x_hat

    def __call__(
        self,
        x,
        tags_emb=None,
        tags_indices=None,
        gumbel_t: float = 1.0,
        train: bool = False,
        class_counts: Optional[Sequence[jax.Array]] = None,
        n_mined_pairs: int = 0,
    ) -> HRqVaeComputedLosses:
        """Full training/eval forward (ref h_rqvae.py:585-672).

        n_mined_pairs > 0 (static) enables the mined-pair uniqueness term
        (PARITY deviation #18): the first 2*n_mined_pairs rows of x are
        audit-harvested duplicate pairs laid out pair-adjacent. Collisions are
        re-verified with an EVAL-mode (deterministic hard-residual) ID pass —
        the train-mode IDs of this forward are unusable for collision
        detection, because the rotation-trick estimator propagates |x|*ê (not
        the codebook vector ê) into the residual chain, so deeper train-mode
        digits disagree with the audit on every row (the reference inherits
        the same train/eval divergence, ref quantize.py:134-140 — measured
        row-level train-vs-eval ID agreement at a trained 200k checkpoint:
        0.000, scripts/diag_mining.py). Still-colliding pairs are pushed apart
        in encoder space with the same relu(cos - margin) penalty as the
        in-batch term, mean over colliding pairs."""
        x = x.astype(jnp.float32)
        if tags_emb is not None:
            tags_emb = tags_emb.astype(jnp.float32)

        encoded = self.encode(x)
        # Loss isolation (mined_loss_isolation): all non-uniqueness losses are
        # computed on the uniformly sampled rows only; the mined rows' sole
        # gradient path is the pair penalty below. Static slices (n_mined_pairs
        # is a trace-time constant), so jit shapes stay fixed. The single
        # shared encode pass means BatchNorm statistics still see all rows.
        iso = self.mined_loss_isolation and n_mined_pairs > 0
        cut = 2 * n_mined_pairs if iso else 0
        main_enc = encoded[cut:]
        main_x = x[cut:]
        main_te = tags_emb[cut:] if tags_emb is not None else None
        main_ti = tags_indices[cut:] if tags_indices is not None else None
        quantized = self.get_semantic_ids(
            main_enc, main_te, main_ti, gumbel_t, train=train,
            class_counts=class_counts,
        )
        x_hat = self.reconstruct(jnp.sum(quantized.embeddings, axis=-2))
        if self.n_cat_features > 0:
            recon = categorical_reconstruction_loss(x_hat, main_x, self.n_cat_features)
        else:
            recon = reconstruction_loss(x_hat, main_x)

        uniq = uniqueness_loss(
            quantized.sem_ids,
            main_enc,
            margin=self.sem_id_uniqueness_margin,
            weight=self.sem_id_uniqueness_weight,
        )
        mined_collision_rate = jnp.float32(0.0)
        if n_mined_pairs > 0:
            enc_p = encoded[: 2 * n_mined_pairs]
            ids_clean = jax.lax.stop_gradient(
                self.get_semantic_ids(enc_p).sem_ids
            )  # eval-mode hard-residual IDs: agree with the corpus audit
            pair_ids = ids_clean.reshape(n_mined_pairs, 2, -1)
            eq = jnp.all(pair_ids[:, 0] == pair_ids[:, 1], axis=-1)
            f = l2norm(enc_p, axis=-1)
            cos = jnp.sum(f[0::2] * f[1::2], axis=-1)
            m_margin = (self.sem_id_mining_margin
                        if self.sem_id_mining_margin is not None
                        else self.sem_id_uniqueness_margin)
            pen = jax.nn.relu(cos - m_margin) * eq
            n_coll = jnp.sum(eq)
            mined = jnp.where(
                n_coll > 0, jnp.sum(pen) / jnp.maximum(n_coll, 1), 0.0
            )
            uniq = uniq + self.sem_id_uniqueness_weight * mined
            mined_collision_rate = jax.lax.stop_gradient(
                n_coll / n_mined_pairs
            )

        # Total (ref h_rqvae.py:634-640); note the double application of the
        # alignment and uniqueness weights — see module docstring.
        loss = (
            jnp.mean(recon)
            + jnp.mean(quantized.quantize_loss)
            + self.tag_alignment_weight * quantized.tag_align_loss
            + self.tag_prediction_weight * quantized.tag_pred_loss
            + self.sem_id_uniqueness_weight * uniq
        )

        return HRqVaeComputedLosses(
            loss=loss,
            reconstruction_loss=jnp.mean(recon),
            rqvae_loss=jnp.mean(quantized.quantize_loss),
            tag_align_loss=quantized.tag_align_loss,
            tag_pred_loss=quantized.tag_pred_loss,
            tag_pred_accuracy=quantized.tag_pred_accuracy,
            embs_norm=jnp.linalg.norm(quantized.embeddings, axis=-1),
            p_unique_ids=jax.lax.stop_gradient(p_unique_ids_stat(quantized.sem_ids)),
            tag_align_loss_by_layer=quantized.tag_align_loss_by_layer,
            tag_pred_loss_by_layer=quantized.tag_pred_loss_by_layer,
            tag_pred_accuracy_by_layer=quantized.tag_pred_accuracy_by_layer,
            sem_id_uniqueness_loss=uniq,
            mined_pair_collision_rate=mined_collision_rate,
        )

    def predict_tags(self, x, gumbel_t: float = 0.001, noise_rng=None, noise_scale: float = 0.0):
        """Predict per-level tag indices + confidences for item features
        (ref h_rqvae.py:674-738). Supports [B, F] or [B, N, F] inputs.

        `noise_rng`/`noise_scale` enable the trainer's TTA augmentation
        (train_hidvae.py eval: noise-perturbed forward passes, averaged).
        Returns dict(predictions [.., L], confidences [.., L], logits list).
        """
        orig_shape = x.shape
        is_seq = x.ndim == 3
        if is_seq:
            b, n, f = orig_shape
            x = x.reshape(-1, f)
        if noise_rng is not None and noise_scale > 0:
            x = x + noise_scale * jax.random.normal(noise_rng, x.shape, x.dtype)

        res = self.encode(x.astype(jnp.float32))
        embs = []
        preds, confs, logits_all = [], [], []
        # Only tag-supervised levels have predictors; deeper levels refine the
        # residual code but carry no tags (n_tag_levels == n_layers in every
        # reference config).
        for i, layer in enumerate(self.layers[: self.n_tag_levels]):
            out = layer(res, temperature=gumbel_t, train=False)
            embs.append(out.embeddings)
            concat_emb = jnp.concatenate(embs, axis=-1)
            logits = self.tag_predictors[i](concat_emb, train=False)
            probs = jax.nn.softmax(logits, axis=-1)
            preds.append(jnp.argmax(probs, axis=-1).astype(jnp.int32))
            confs.append(jnp.max(probs, axis=-1))
            logits_all.append(logits)
            res = res - out.embeddings

        predictions = jnp.stack(preds, axis=-1)
        confidences = jnp.stack(confs, axis=-1)
        if is_seq:
            predictions = predictions.reshape(b, n, -1)
            confidences = confidences.reshape(b, n, -1)
        return {
            "predictions": predictions,
            "confidences": confidences,
            "logits": logits_all,
        }
