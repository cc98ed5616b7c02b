"""Loss functions for stage-1 tokenizer training.

Parity: reference modules/loss.py (ReconstructionLoss, CategoricalReconstructionLoss,
QuantizeLoss, TagAlignmentLoss, TagPredictionLoss) and the SemanticIdUniquenessLoss
from modules/h_rqvae.py:25-105.

TPU redesign notes:
  * Every loss is a pure function with explicit PRNG handling; no nn.Module state.
  * Data-dependent control flow in the reference (boolean indexing of valid rows,
    `if identical_pairs_mask.any()`, mixup branches — loss.py:121-151,
    h_rqvae.py:73-84) is rewritten as always-computed masked math so the whole
    train step stays a single jitted XLA program with static shapes.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from hidvae_tpu.ops.normalize import l2norm


def reconstruction_loss(x_hat, x):
    """Per-sample squared-error sum (ref loss.py:7-12). Returns [B]."""
    return jnp.sum(jnp.square(x_hat - x), axis=-1)


def categorical_reconstruction_loss(x_hat, x, n_cat_feats: int):
    """MSE on dense dims + BCE-with-logits summed over trailing categorical dims
    (ref loss.py:15-33). Returns [B]."""
    if n_cat_feats <= 0:
        return reconstruction_loss(x_hat, x)
    dense = reconstruction_loss(x_hat[..., :-n_cat_feats], x[..., :-n_cat_feats])
    logits = x_hat[..., -n_cat_feats:]
    targets = x[..., -n_cat_feats:]
    # Numerically-stable BCE with logits: max(z,0) - z*y + log(1+exp(-|z|)).
    bce = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return dense + jnp.sum(bce, axis=-1)


def quantize_loss(query, value, commitment_weight: float = 1.0):
    """Codebook + commitment loss, straight-through style (ref loss.py:36-44).

    ||sg(query) - value||^2 + beta * ||query - sg(value)||^2, per sample [B].
    """
    emb_loss = jnp.sum(jnp.square(jax.lax.stop_gradient(query) - value), axis=-1)
    query_loss = jnp.sum(jnp.square(query - jax.lax.stop_gradient(value)), axis=-1)
    return emb_loss + commitment_weight * query_loss


def tag_alignment_loss(
    codebook_emb,
    tag_emb,
    layer_idx: int,
    alignment_weight: float = 1.0,
    temperature: float = 0.1,
):
    """InfoNCE between concat codebook embeddings and projected tag embeddings
    (ref loss.py:48-85). Scalar; layer weight 1 / (0.5 * layer_idx + 1)."""
    cb = l2norm(codebook_emb, axis=-1)
    tg = l2norm(tag_emb, axis=-1)
    logits = jnp.dot(cb, tg.T, preferred_element_type=jnp.float32) / temperature
    # Diagonal-target cross entropy as diag - logsumexp(row): same math as
    # log_softmax + diagonal gather, but one of the two [B, B] intermediates
    # (the log-prob matrix) is never formed — logsumexp still reads `logits`
    # once, so this halves the loss's HBM traffic rather than eliminating it.
    # At bs4096 each [B, B] fp32 matrix is 67 MB and this loss runs x3 levels,
    # fwd+bwd (BASELINE.md stage-1 attribution).
    diag = jnp.sum((cb * tg).astype(jnp.float32), axis=-1) / temperature
    loss = -jnp.mean(diag - jax.scipy.special.logsumexp(logits, axis=-1))
    layer_weight = 1.0 / (layer_idx * 0.5 + 1.0)
    return loss * alignment_weight * layer_weight


def uniqueness_loss(sem_ids, encoded_features, margin: float = 0.5, weight: float = 1.0):
    """Semantic-ID uniqueness constraint (ref h_rqvae.py:25-105).

    For every batch pair (i < j) whose full ID tuples collide, penalize
    relu(cos_sim(enc_i, enc_j) - margin); mean over colliding pairs.
    Masked-pairwise formulation replaces the reference's torch.where gather so
    the shape stays static under jit.
    """
    b = sem_ids.shape[0]
    if b <= 1:
        return jnp.float32(0.0)
    eq = jnp.all(sem_ids[:, None, :] == sem_ids[None, :, :], axis=-1)  # [B, B]
    iu = jnp.triu(jnp.ones((b, b), bool), k=1)
    pair_mask = (eq & iu).astype(jnp.float32)
    feats = l2norm(encoded_features, axis=-1)
    cos = jnp.dot(feats, feats.T, preferred_element_type=jnp.float32)  # [B, B]
    penalty = jax.nn.relu(cos - margin)
    n_pairs = jnp.sum(pair_mask)
    loss = jnp.sum(penalty * pair_mask) / jnp.maximum(n_pairs, 1.0)
    return weight * jnp.where(n_pairs > 0, loss, 0.0)


class TagPredictionLossOutput(NamedTuple):
    loss: jax.Array      # scalar
    accuracy: jax.Array  # scalar


def _smoothed_one_hot(targets, num_classes, smoothing):
    one_hot = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    return one_hot * (1.0 - smoothing) + smoothing / num_classes


def _focal_smoothing(gamma, num_classes, label_smoothing_alpha, apply: bool):
    """Label-smoothing amount used inside both focal variants (ref loss.py:247-251)."""
    if not apply:
        return 0.0
    class_factor = min(0.3, 0.05 * (num_classes / 100.0))
    return min(0.25, label_smoothing_alpha + gamma * 0.015 + class_factor)


def _kl_to_uniform(logits):
    """KL(uniform || softmax(logits)), batch-mean (torch F.kl_div semantics at
    ref loss.py:222-223/316-317 with target=uniform)."""
    c = logits.shape[-1]
    log_probs = jnp.log(jax.nn.softmax(logits, axis=-1) + 1e-8)
    # sum over classes of u * (log u - log p), averaged over batch
    per_sample = jnp.sum((1.0 / c) * (jnp.log(1.0 / c) - log_probs), axis=-1)
    return jnp.mean(per_sample)


def tag_prediction_loss(
    logits,
    targets,
    layer_idx: int = 0,
    *,
    use_focal_loss: bool = False,
    focal_gamma: float = 2.0,
    focal_alpha: float = 0.25,
    class_counts: Optional[jax.Array] = None,
    use_label_smoothing: bool = True,
    label_smoothing_alpha: float = 0.1,
    use_mixup: bool = True,
    mixup_alpha: float = 0.2,
    rng: Optional[jax.Array] = None,
    training: bool = False,
) -> TagPredictionLossOutput:
    """Tag classification loss with focal/CE, smoothing, mixup, class weights and
    KL-to-uniform regularization (ref loss.py:89-321).

    Reference behaviors kept:
      * invalid targets (< 0) are excluded from both loss and accuracy via
        masking (ref loss.py:121-129); zero valid targets -> (0, 0).
      * focal path: gamma scaled by (1 + 0.35 * layer_idx), alpha floored at
        0.08 minus 0.06 * layer_idx (ref loss.py:159-162).
      * class-count weighting: 1/sqrt(freq), mean-normalized, clamped to
        [0.5, 3.0] (ref loss.py:169-175), with the adjusted gamma and the
        >100-classes KL regularizer of the weighted variant (ref loss.py:296-319).
      * non-focal path: CE with depth-scaled label smoothing + 0.05 * KL reg
        (ref loss.py:205-226).

    Mixup redesign (maskable): the reference permutes only the valid-row subset
    (dynamic shape, loss.py:139-154); here we permute the full batch and
    redirect any invalid mixup partner back to the sample itself, which is
    identical when all targets are valid (the common case after rare-tag
    remapping).
    """
    num_classes = logits.shape[-1]
    valid = (targets >= 0)
    valid_f = valid.astype(jnp.float32)
    n_valid = jnp.sum(valid_f)
    safe_targets = jnp.where(valid, targets, 0)

    pred = jnp.argmax(logits, axis=-1)
    accuracy = jnp.sum((pred == safe_targets) * valid_f) / jnp.maximum(n_valid, 1.0)

    # KL regularizer uses pre-mixup probabilities (ref loss.py:135,222).
    kl_pre = _kl_to_uniform(logits)

    do_mixup = use_mixup and training and rng is not None
    if do_mixup:
        rng_perm, rng_lam = jax.random.split(rng)
        perm = jax.random.permutation(rng_perm, logits.shape[0])
        # Redirect invalid partners to self so masked rows never leak in.
        perm = jnp.where(valid[perm], perm, jnp.arange(logits.shape[0]))
        lam = jax.random.beta(rng_lam, mixup_alpha, mixup_alpha)
        mixed_logits = lam * logits + (1.0 - lam) * logits[perm]
        targets_a, targets_b = safe_targets, safe_targets[perm]
    else:
        lam = jnp.float32(1.0)
        mixed_logits = logits
        targets_a = targets_b = safe_targets

    def masked_mean(per_sample):
        return jnp.sum(per_sample * valid_f) / jnp.maximum(n_valid, 1.0)

    if use_focal_loss:
        gamma = focal_gamma * (1.0 + 0.35 * layer_idx)
        alpha = max(0.08, focal_alpha - 0.06 * layer_idx)
        smoothing = _focal_smoothing(gamma, num_classes, label_smoothing_alpha,
                                     apply=use_label_smoothing and training)

        if class_counts is not None:
            freq = jnp.clip(class_counts.astype(jnp.float32) /
                            jnp.maximum(jnp.sum(class_counts), 1.0), 1e-6, None)
            weights = 1.0 / jnp.sqrt(freq)
            weights = jnp.clip(weights / jnp.mean(weights), 0.5, 3.0)
            adj_gamma = gamma * (1.0 + 0.25 * min(1.0, num_classes / 250.0))

            def weighted_focal(tgt):
                one_hot = _smoothed_one_hot(tgt, num_classes, smoothing)
                probs = jax.nn.softmax(mixed_logits, axis=-1)
                pt = jnp.sum(one_hot * probs, axis=-1)
                log_probs = jax.nn.log_softmax(mixed_logits, axis=-1)
                ce = -jnp.sum(one_hot * log_probs, axis=-1)
                fl = masked_mean(weights[tgt] * (1.0 - pt) ** adj_gamma * ce)
                if num_classes > 100:
                    reg_w = min(0.12, 0.015 * (num_classes / 100.0))
                    fl = fl + reg_w * _kl_to_uniform(mixed_logits) * (1.0 if training else 0.0)
                return fl

            loss = lam * weighted_focal(targets_a) + (1.0 - lam) * weighted_focal(targets_b)
        else:
            def plain_focal(tgt):
                one_hot = _smoothed_one_hot(tgt, num_classes, smoothing)
                probs = jax.nn.softmax(mixed_logits, axis=-1)
                pt = jnp.sum(one_hot * probs, axis=-1)
                log_probs = jax.nn.log_softmax(mixed_logits, axis=-1)
                ce = -jnp.sum(one_hot * log_probs, axis=-1)
                return masked_mean(alpha * (1.0 - pt) ** gamma * ce)

            loss = lam * plain_focal(targets_a) + (1.0 - lam) * plain_focal(targets_b)
    else:
        label_smoothing = min(0.25, 0.05 + layer_idx * 0.06)

        def smoothed_ce(tgt):
            one_hot = _smoothed_one_hot(tgt, num_classes, label_smoothing)
            log_probs = jax.nn.log_softmax(mixed_logits, axis=-1)
            return masked_mean(-jnp.sum(one_hot * log_probs, axis=-1))

        ce = lam * smoothed_ce(targets_a) + (1.0 - lam) * smoothed_ce(targets_b)
        loss = ce + 0.05 * kl_pre

    has_valid = n_valid > 0
    return TagPredictionLossOutput(
        loss=jnp.where(has_valid, loss, 0.0),
        accuracy=jnp.where(has_valid, accuracy, 0.0),
    )
