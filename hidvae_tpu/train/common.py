"""Shared training infrastructure: train state, optimizers, schedules,
checkpointing, and diversity metrics.

Parity targets:
  * AdamW + cosine / step LR schedules (ref train_hidvae.py:634-656) and the
    warmup inverse-sqrt schedule (ref modules/scheduler/inv_sqrt.py:5-15).
  * Layer-specific learning rates for tag predictors/projectors
    (ref train_hidvae.py:532-568): predictor_lr = lr * (1 + 0.1 * i),
    predictor_wd = wd / (1 + 0.2 * i).
  * Gradient accumulation (ref train_hidvae.py:699-706) via optax.MultiSteps.
  * Checkpoints carry {step, params, (batch_stats), opt_state, model_config}
    like the reference's torch dicts (train_rqvae.py:302-313), stored with
    Orbax.
  * Semantic-ID diversity metrics: repetition rate (train_hidvae.py:39-63),
    RQ entropy / max duplicates / per-level codebook usage
    (train_rqvae.py:316-343).
"""

import json
import os
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    def apply_gradients(self, *, grads, tx, new_batch_stats=None):
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
        )


def inverse_sqrt_schedule(base_lr: float, warmup_steps: int):
    """Flat during warmup, then base_lr * sqrt(warmup / step)
    (ref modules/scheduler/inv_sqrt.py:5-15)."""

    def schedule(step):
        step = jnp.maximum(step, 1)
        scale = jnp.where(
            step <= warmup_steps,
            1.0,
            jnp.sqrt(warmup_steps / step.astype(jnp.float32)),
        )
        return base_lr * scale

    return schedule


def make_lr_schedule(
    learning_rate: float,
    use_lr_scheduler: bool = False,
    lr_scheduler_type: str = "cosine",
    lr_scheduler_T_max: int = 400_000,
    lr_scheduler_eta_min: float = 1e-7,
    lr_scheduler_step_size: int = 100_000,
    lr_scheduler_gamma: float = 0.5,
):
    """Cosine / step schedules matching torch.optim.lr_scheduler semantics
    (ref train_hidvae.py:634-656).

    'reduce_on_plateau' is metric-driven, not step-driven, so it cannot be a
    pure schedule: the base LR stays constant here and the plateau factor is
    applied through the `scale_by_plateau` optax transform, stepped from eval
    loss by the host-side `ReduceLROnPlateau` controller (the reference
    declares this unsupported and comments it out, ref train_hidvae.py:646-650;
    we implement the torch semantics it intended)."""
    if not use_lr_scheduler:
        return learning_rate
    if lr_scheduler_type == "reduce_on_plateau":
        return learning_rate
    if lr_scheduler_type == "cosine":
        # CosineAnnealingLR: eta_min + (lr - eta_min)(1 + cos(pi t/T))/2
        def schedule(step):
            t = jnp.minimum(step, lr_scheduler_T_max).astype(jnp.float32)
            cos = 0.5 * (1.0 + jnp.cos(jnp.pi * t / lr_scheduler_T_max))
            return lr_scheduler_eta_min + (learning_rate - lr_scheduler_eta_min) * cos

        return schedule
    if lr_scheduler_type == "step":
        def schedule(step):
            k = (step // lr_scheduler_step_size).astype(jnp.float32)
            return learning_rate * (lr_scheduler_gamma ** k)

        return schedule
    return learning_rate


# ---------------- reduce-on-plateau (metric-driven LR) ----------------


class PlateauScale(NamedTuple):
    """Opt-state leaf holding the current plateau LR multiplier. Lives inside
    opt_state so it (a) is a jit argument, not a baked constant — the host can
    change it with zero recompiles — and (b) checkpoints/restores with the
    rest of the optimizer state."""

    scale: Any


def scale_by_plateau(init_scale: float = 1.0):
    """Optax transform multiplying final updates by a host-controlled scale.

    Chained AFTER adamw, so the scale multiplies the already-LR-scaled update
    (including the decoupled weight-decay term) — exactly what torch's
    ReduceLROnPlateau does by rewriting param-group LRs
    (ref train_hidvae.py:646-650 intends this; see ReduceLROnPlateau below)."""

    def init_fn(params):
        del params
        return PlateauScale(scale=jnp.asarray(init_scale, jnp.float32))

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(
            lambda u: (u * state.scale).astype(u.dtype), updates
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def set_plateau_scale(opt_state, scale: float):
    """Functionally replace every PlateauScale leaf in an opt_state tree —
    the host-side 'scheduler.step()' of the plateau controller."""
    is_ps = lambda s: isinstance(s, PlateauScale)  # noqa: E731
    return jax.tree_util.tree_map(
        lambda s: PlateauScale(scale=jnp.asarray(scale, jnp.float32))
        if is_ps(s) else s,
        opt_state, is_leaf=is_ps,
    )


def get_plateau_scale(opt_state):
    """Current PlateauScale multiplier inside an opt_state, or None."""
    is_ps = lambda s: isinstance(s, PlateauScale)  # noqa: E731
    for leaf in jax.tree_util.tree_leaves(opt_state, is_leaf=is_ps):
        if is_ps(leaf):
            return float(leaf.scale)
    return None


class ReduceLROnPlateau:
    """Host-side controller with torch.optim.lr_scheduler.ReduceLROnPlateau
    semantics (mode='min', threshold_mode='rel', torch defaults for
    threshold/cooldown): step() on each eval loss; after > `patience`
    consecutive non-improving evals the LR multiplier shrinks by `factor`.

    The multiplier itself persists in opt_state (PlateauScale); the
    best/bad-count/cooldown counters persist through the checkpoint's
    meta.json (`state_dict`/`load_state_dict`, saved by the trainers) so a
    resumed plateau run continues the exact LR-scale trajectory of an
    uninterrupted one — the framework's bit-identical-resume standard."""

    def __init__(self, factor: float = 0.5, patience: int = 10,
                 threshold: float = 1e-4, cooldown: int = 0,
                 min_scale: float = 0.0, init_scale: float = 1.0):
        self.factor = float(factor)
        self.patience = int(patience)
        self.threshold = float(threshold)
        self.cooldown = int(cooldown)
        self.min_scale = float(min_scale)
        self.scale = float(init_scale)
        self.best = None
        self.num_bad = 0
        self.cooldown_counter = 0

    def step(self, value: float) -> float:
        # Exactly torch's ReduceLROnPlateau.step flow: the cooldown counter
        # decrements on EVERY step while in cooldown (including improving
        # ones), and improvement is checked before — not instead of — it.
        value = float(value)
        if self.best is None or value < self.best * (1.0 - self.threshold):
            self.best = value
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        if self.num_bad > self.patience:
            self.scale = max(self.scale * self.factor, self.min_scale)
            self.cooldown_counter = self.cooldown
            self.num_bad = 0
        return self.scale

    def state_dict(self) -> dict:
        """Host-side counters for checkpoint meta (the multiplier itself also
        rides in opt_state; storing `scale` here keeps the meta self-describing
        and guards against a meta/opt_state skew on partial restores)."""
        return {
            "scale": self.scale,
            "best": self.best,
            "num_bad": self.num_bad,
            "cooldown_counter": self.cooldown_counter,
        }

    def load_state_dict(self, state: dict):
        self.scale = float(state["scale"])
        self.best = None if state["best"] is None else float(state["best"])
        self.num_bad = int(state["num_bad"])
        self.cooldown_counter = int(state["cooldown_counter"])


def make_optimizer(
    learning_rate,
    weight_decay: float,
    *,
    gradient_accumulate_every: int = 1,
    layer_specific_lr: bool = False,
    predictor_weight_decay: float = 0.02,
    n_layers: int = 3,
    params_example=None,
    max_grad_norm=None,
    plateau: bool = False,
):
    """AdamW, optionally with per-layer parameter groups for the tag heads
    (ref train_hidvae.py:532-575) and global-norm gradient clipping."""
    if not layer_specific_lr:
        tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    else:
        assert params_example is not None

        def label_fn(params):
            def top_label(path_key):
                name = path_key
                for i in range(n_layers):
                    if name == f"tag_predictor_{i}" or name == f"tag_projector_{i}":
                        return f"head_{i}"
                return "base"

            return {k: jax.tree_util.tree_map(lambda _: top_label(k), v)
                    for k, v in params.items()}

        transforms = {"base": optax.adamw(learning_rate, weight_decay=weight_decay)}
        for i in range(n_layers):
            lr_i = (
                (lambda s, i=i: learning_rate(s) * (1 + i * 0.1))
                if callable(learning_rate)
                else learning_rate * (1 + i * 0.1)
            )
            wd_i = predictor_weight_decay / (1 + i * 0.2)
            transforms[f"head_{i}"] = optax.adamw(lr_i, weight_decay=wd_i)
        tx = optax.multi_transform(transforms, label_fn)

    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    if plateau:
        tx = optax.chain(tx, scale_by_plateau())
    if gradient_accumulate_every > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=gradient_accumulate_every)
    return tx


# ---------------- checkpointing ----------------


def save_checkpoint(save_dir: str, name: str, payload: dict):
    """Orbax checkpoint with the reference's logical contents
    (ref train_rqvae.py:302-313 — incl. the optimizer state — plus quality
    fields train_hidvae.py:1145-1177 and the stage-2 scheduler position,
    train_transformer.py:823-835; schedule counts live inside opt_state here).

    Arrays are serialized through flax state-dicts so optax states (namedtuple
    chains, MultiSteps accumulators) become pure nested dicts that Orbax can
    restore without a target structure.
    """
    import orbax.checkpoint as ocp
    from flax import serialization

    path = os.path.abspath(os.path.join(save_dir, name))
    ckptr = ocp.StandardCheckpointer()
    arrays = serialization.to_state_dict(
        {k: v for k, v in payload.items()
         if k not in ("model_config", "metrics", "plateau")}
    )
    ckptr.save(path, arrays, force=True)
    ckptr.wait_until_finished()
    meta = {
        k: payload[k]
        for k in ("model_config", "metrics", "plateau")
        if k in payload
    }
    if meta:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)
    return path


def restore_checkpoint(path: str, example_payload: dict, *, lenient: bool = True,
                       mismatch_tolerance: float = 0.1):
    """Restore an Orbax checkpoint into the example structure.

    With `lenient=True` (default) this reproduces the reference's
    checkpoint-shape self-healing (h_rqvae.py:382-471 + strict=False
    fallback): entries missing from the checkpoint keep the example's values,
    extra checkpoint entries are dropped, and shape-mismatched leaves are
    skipped with a warning — so a stage-2 run can consume a stage-1 checkpoint
    whose tag heads were rebuilt by the rare-tag remap, and an old checkpoint
    without `opt_state` still restores params.

    Leniency is bounded: when more than `mismatch_tolerance` of the target's
    `params` leaves are shape-mismatched, the target model is structurally a
    *different* model than the checkpoint's (wrong attn_layers / hidden dims /
    embed dim), not a tag-head rebuild — restoring "leniently" would keep most
    weights at random init and silently serve garbage. Raise instead. The
    legitimate self-heal cases (rare-tag remap rebuilding per-level classifier
    output layers) touch only a few leaves and stay under the tolerance.

    The merge happens on flax state-dicts (pure nested string-keyed dicts) so
    optax namedtuple states line up with Orbax's target-less raw restore.
    """
    import logging

    import orbax.checkpoint as ocp
    from flax import serialization, traverse_util

    log = logging.getLogger("hidvae_tpu.checkpoint")
    arrays = {
        k: v for k, v in example_payload.items()
        if k not in ("model_config", "metrics", "plateau")
    }
    abspath = os.path.abspath(path)
    if not lenient:
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(abspath, serialization.to_state_dict(arrays))
        restored = serialization.from_state_dict(arrays, restored)
    else:
        with ocp.PyTreeCheckpointer() as ckptr:
            raw = ckptr.restore(abspath)  # structure as saved, no target

        flat_raw = traverse_util.flatten_dict(raw)
        flat_target = traverse_util.flatten_dict(
            serialization.to_state_dict(arrays), keep_empty_nodes=True
        )
        merged = {}
        mismatched, n_param_leaves = [], 0
        for key_path, value in flat_target.items():
            src = flat_raw.get(key_path)
            name = "/".join(map(str, key_path))
            is_param = key_path[0] == "params" if "params" in arrays else True
            n_param_leaves += is_param
            if value is traverse_util.empty_node:
                merged[key_path] = value
            elif src is None:
                log.warning(f"checkpoint missing {name}; keeping initialized value")
                # A missing *param* leaf is as structural as a shape mismatch:
                # a model with more layers than the checkpoint keeps whole
                # blocks at random init (missing whole top-level keys like
                # opt_state is the legitimate old-checkpoint case and is not
                # under `params`).
                if is_param:
                    mismatched.append(name + " (missing)")
                merged[key_path] = value
            elif hasattr(value, "shape") and tuple(src.shape) != tuple(value.shape):
                log.warning(
                    f"checkpoint shape mismatch at {name}: "
                    f"{tuple(src.shape)} vs {tuple(value.shape)}; keeping initialized value"
                )
                if is_param:
                    mismatched.append(name)
                merged[key_path] = value
            else:
                merged[key_path] = (
                    jnp.asarray(src).astype(getattr(value, "dtype", None))
                    if hasattr(value, "dtype") else src
                )
        # The tolerance is relative with an absolute floor: a legitimate
        # rare-tag-head rebuild touches ~2 leaves (kernel+bias) per quantizer
        # level, which on a tiny model can exceed 10% of all param leaves —
        # allow at least 8 mismatched leaves before declaring the checkpoint
        # structurally incompatible.
        allowed = max(mismatch_tolerance * max(n_param_leaves, 1), 8)
        if mismatched and len(mismatched) > allowed:
            raise ValueError(
                f"checkpoint {path} is structurally incompatible with the "
                f"requested model: {len(mismatched)}/{n_param_leaves} param "
                f"leaves are shape-mismatched or missing (> "
                f"{mismatch_tolerance:.0%} tolerance). First: {mismatched[:5]}. "
                f"A lenient "
                f"restore would keep these at random init — rebuild the model "
                f"with the checkpoint's recorded model_config instead."
            )
        restored = serialization.from_state_dict(
            arrays, traverse_util.unflatten_dict(merged)
        )
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            restored = dict(restored, **json.load(f))
    return restored


def log_operative_config(logger, values: dict):
    """Log every bound trainer argument at startup — the analogue of gin's
    operative-config dump (the reference relies on gin_config_to_readable_dict
    + wandb for this; ref utils.py:47-62). One line, sorted, so a run's exact
    configuration is always recoverable from its train.log."""
    import enum

    items = []
    for k in sorted(values):
        if k.startswith("_"):
            continue
        v = values[k]
        if isinstance(v, (bool, int, float, str, list, tuple, type(None), enum.Enum)):
            items.append(f"{k}={v!r}")
    logger.info("operative config: " + " ".join(items))


# ---------------- structural model config ----------------

# Fields of the stage-1 VAE whose values change forward semantics or parameter
# shapes. A stage-2 run MUST build its frozen tokenizer with the exact values
# the checkpoint was trained with — a mismatch in e.g. codebook_normalize
# keeps every parameter shape identical (so a lenient restore succeeds
# silently) while making every quantizer distance computation wrong, which
# collapses the corpus ID table. The reference has the same hazard: its
# committed decoder_kuairand.gin omits flags its stage-1 h_rqvae_kuairand.gin
# sets (ref configs/decoder_kuairand.gin vs h_rqvae_kuairand.gin).
STRUCTURAL_VAE_KEYS = (
    "input_dim",
    "embed_dim",
    "hidden_dims",
    "codebook_size",
    "codebook_normalize",
    "codebook_sim_vq",
    "n_layers",
    "n_cat_features",
    "tag_class_counts",
    "tag_embed_dim",
)


def structural_model_config(model) -> dict:
    """Extract the structural config of an RqVae/HRqVae as JSON-native values."""
    cfg = {}
    for key in STRUCTURAL_VAE_KEYS:
        if not hasattr(model, key):
            continue
        v = getattr(model, key)
        if isinstance(v, (tuple, list)):
            v = [int(x) for x in v]
        elif isinstance(v, (np.integer, jnp.integer)):
            v = int(v)
        cfg[key] = v
    return cfg


def load_checkpoint_meta(path: str) -> dict:
    """Read <path>/meta.json ({model_config, metrics}), or {} if absent."""
    meta_path = os.path.join(path, "meta.json")
    if not os.path.exists(meta_path):
        return {}
    with open(meta_path) as f:
        return json.load(f)


def load_checkpoint_model_config(path: str):
    """Read model_config from <path>/meta.json, or None if absent."""
    return load_checkpoint_meta(path).get("model_config")


def reconcile_vae_config(pretrained_path: str, requested: dict, logger=None) -> dict:
    """Overlay the checkpoint's recorded structural config onto the requested one.

    `requested` maps STRUCTURAL_VAE_KEYS names to the values the caller (gin
    config / CLI) asked for. Any key the checkpoint's meta.json records wins;
    every difference is logged loudly. Keys the checkpoint doesn't record
    (e.g. old 4-field meta files) keep the requested values.

    This is the self-heal that prevents silently rebuilding the frozen stage-1
    tokenizer with different forward semantics than it was trained with
    (ref train_transformer.py:222-270 trusts gin blindly and has the same
    failure mode; deviation documented in PARITY.md).
    """
    import logging

    log = logger or logging.getLogger("hidvae_tpu.checkpoint")
    saved = load_checkpoint_model_config(pretrained_path)
    if not saved:
        return dict(requested)

    def norm(v):
        if isinstance(v, (tuple, list)):
            return [int(x) for x in v]
        if isinstance(v, bool):
            return v
        if isinstance(v, str):
            # Legacy meta files stored values stringified.
            low = v.strip().lower()
            if low in ("true", "false"):
                return low == "true"
            try:
                return int(v)
            except ValueError:
                return v
        return v

    out = dict(requested)
    for key, want in requested.items():
        if key not in saved or saved[key] is None:
            # Absent or null = "not recorded" (e.g. a model built without tag
            # heads) — keep the requested value rather than adopting None.
            continue
        have = norm(saved[key])
        if norm(want) != have:
            log.warning(
                f"pretrained checkpoint {pretrained_path} was trained with "
                f"{key}={have!r} but the config requests {key}={want!r}; "
                f"using the checkpoint's value (structural self-heal)"
            )
            out[key] = have
    return out


def tokenizer_sem_cols(tokenizer):
    """Column indices of the SEMANTIC digits in a tokenizer's corpus table.

    Interleaved layouts place semantic digits at [0, 2, 4, ...]
    (ref train_transformer.py:306-316); concatenated/dedup layouts put them
    first. Tag / dedup-rank columns are excluded: they vary per item even when
    the semantic index has collapsed, so any collapse audit must slice them
    off."""
    d = tokenizer.sem_ids_dim
    if getattr(tokenizer, "use_interleaved_ids", False):
        return [2 * i for i in range(tokenizer.n_layers) if 2 * i < d]
    return list(range(min(tokenizer.n_layers, d)))


def audit_rebuilt_corpus(tokenizer, corpus_ids, stage1_checkpoint, log=None):
    """Diversity audit of a rebuilt corpus table + collapse guard against the
    stage-1 checkpoint's recorded (semantic-tuple) repetition rate.

    Returns (div_full, div_sem): diversity over full ID tuples and over the
    semantic digits alone. The guard compares semantic-to-semantic — dedup
    rank and tag columns make full tuples unique regardless of semantic
    collapse, so guarding on the full table would mask exactly the failure
    (silently degenerate index) this exists to catch. Raises RuntimeError on
    contradiction; stage-1 checkpoints with no recorded metrics pass through.
    """
    ids = np.asarray(corpus_ids)
    sem_cols = tokenizer_sem_cols(tokenizer)
    div = id_diversity_metrics(
        ids, tokenizer.codebook_size, tokenizer.n_layers, sem_cols=sem_cols
    )
    div_sem = (
        id_diversity_metrics(ids[:, sem_cols], tokenizer.codebook_size,
                             tokenizer.n_layers)
        if ids.shape[1] > len(sem_cols) else div
    )
    if log is not None:
        log.info(f"Corpus ID diversity: {div}")
        if div_sem is not div:
            log.info(f"Semantic-only slice diversity: {div_sem}")
    if stage1_checkpoint is not None:
        recorded = load_checkpoint_meta(stage1_checkpoint).get("metrics", {})
        err = corpus_collapse_error(recorded.get("repetition_rate"), div_sem)
        if err:
            raise RuntimeError(f"{err} (checkpoint: {stage1_checkpoint})")
    return div, div_sem


def corpus_collapse_error(recorded_rep, div: dict):
    """Return an error message when a rebuilt tokenizer's corpus diversity
    wildly contradicts the checkpoint's recorded repetition rate, else None.

    recorded_rep < 0.1 (the checkpoint passed or neared the reference's 0.06
    gate, ref configs/h_rqvae_amazon.gin:49) while the rebuilt corpus repeats
    > 0.5 can only mean the frozen stage-1 model was rebuilt with different
    semantics than it was trained with; legitimately-collapsed tokenizers
    (e.g. plain RQ without uniqueness supervision) record their own high
    repetition and pass through.
    """
    if recorded_rep is None or recorded_rep >= 0.1:
        return None
    if div["repetition_rate"] <= 0.5:
        return None
    return (
        f"Corpus ID table collapsed: the stage-1 checkpoint recorded "
        f"repetition_rate={recorded_rep:.4f} but the rebuilt tokenizer "
        f"produces {div['repetition_rate']:.4f} "
        f"({div['unique_ids']}/{div['total_ids']} unique). The frozen "
        f"stage-1 model was rebuilt with different semantics than it was "
        f"trained with — check the vae_* config values."
    )


# ---------------- diversity metrics ----------------


def repetition_rate(corpus_ids: np.ndarray):
    """1 - unique/total over full ID tuples (ref train_hidvae.py:39-63)."""
    total = len(corpus_ids)
    if total == 0:
        return 0.0, 0, 0
    unique = len(np.unique(corpus_ids, axis=0))
    return 1.0 - unique / total, unique, total


def id_diversity_metrics(corpus_ids: np.ndarray, codebook_size: int, n_sem_layers: int,
                         sem_cols=None):
    """Entropy of the unique-tuple distribution, max duplicates, per-level
    codebook usage (ref train_rqvae.py:316-343).

    sem_cols: which columns hold semantic digits (used for codebook usage);
    defaults to the first n_sem_layers columns. Concatenated/interleaved
    layouts place tag digits among the columns, so callers auditing a full
    mixed table pass the semantic positions explicitly."""
    ids = np.asarray(corpus_ids)
    _, counts = np.unique(ids, axis=0, return_counts=True)
    probs = counts / counts.sum()
    entropy = float(-(probs * np.log(probs)).sum())
    max_dup = int(counts.max())
    if sem_cols is None:
        sem_cols = range(min(n_sem_layers, ids.shape[1]))
    usage = [float(len(np.unique(ids[:, l])) / codebook_size) for l in sem_cols]
    rep, unique, total = repetition_rate(ids)
    return {
        "rqvae_entropy": entropy,
        "max_id_duplicates": max_dup,
        "codebook_usage": usage,
        "repetition_rate": rep,
        "unique_ids": unique,
        "total_ids": total,
    }
