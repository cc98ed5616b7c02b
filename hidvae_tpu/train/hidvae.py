"""Stage-1 trainer for the hierarchically-supervised HiD-VAE tokenizer.

Parity: reference train_hidvae.py `train()` (gin-configurable, ~60 params —
signature mirrored below so the reference's configs/h_rqvae_*.gin bind
verbatim). Pipeline: tagged ItemData -> tag-layer reconciliation -> rare-tag
remap -> HRqVae -> k-means codebook init -> AdamW(+cosine/step schedule,
optional layer-specific LRs) -> fixed gumbel t=0.2 loop with gradient
accumulation -> periodic eval (losses + TTA tag accuracy) + corpus ID
diversity audit -> quality-gated checkpointing (eval tag accuracy > 0.60 AND
semantic-ID repetition < threshold, ref train_hidvae.py:1145-1177).

TPU design: one jitted train step (value_and_grad over the whole HRqVae loss,
mutable batch_stats threaded through) over a ('data', 'model') mesh — batches
sharded over 'data', parameters replicated; XLA inserts the DP gradient
all-reduce. Host code only feeds numpy batches and logs scalars.
"""

import logging
import os
import time
from datetime import datetime
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hidvae_tpu.data.processed import ItemData, RecDataset
from hidvae_tpu.models.hrqvae import HRqVae
from hidvae_tpu.models.quantize import QuantizeForwardMode
from hidvae_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from hidvae_tpu.tokenizer.h_semids import HSemanticIdTokenizer
from hidvae_tpu.train.common import (
    ReduceLROnPlateau,
    TrainState,
    id_diversity_metrics,
    log_operative_config,
    make_lr_schedule,
    make_optimizer,
    restore_checkpoint,
    save_checkpoint,
    set_plateau_scale,
    structural_model_config,
)
from hidvae_tpu.train.init import kmeans_init_codebooks
from hidvae_tpu.train.tags import (
    apply_tag_remap,
    compute_rare_tag_remap,
    post_remap_class_counts,
    reconcile_tag_layers,
)

logger = logging.getLogger("hidvae_tpu.train.hidvae")


def _setup_logging(save_dir: str):
    """File + console logging (ref train_hidvae.py:151-161)."""
    os.makedirs(save_dir, exist_ok=True)
    fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    root = logging.getLogger()
    file_handler = logging.FileHandler(os.path.join(save_dir, "train.log"))
    file_handler.setFormatter(fmt)
    root.addHandler(file_handler)
    if not any(isinstance(h, logging.StreamHandler)
               and not isinstance(h, logging.FileHandler) for h in root.handlers):
        console = logging.StreamHandler()
        console.setFormatter(fmt)
        console.addFilter(lambda r: r.name.startswith("hidvae_tpu"))
        root.addHandler(console)
    root.setLevel(logging.INFO)


def build_model(
    *,
    vae_input_dim,
    vae_embed_dim,
    vae_hidden_dims,
    vae_codebook_size,
    vae_codebook_normalize,
    vae_sim_vq,
    vae_codebook_mode,
    vae_n_layers,
    vae_n_cat_feats,
    commitment_weight,
    tag_alignment_weight,
    tag_prediction_weight,
    tag_class_counts,
    tag_embed_dim,
    use_focal_loss,
    focal_loss_gamma_base,
    focal_loss_alpha_base,
    dropout_rate,
    use_batch_norm,
    alignment_temperature,
    sem_id_uniqueness_weight,
    sem_id_uniqueness_margin,
    use_label_smoothing=True,
    label_smoothing_alpha=0.1,
    use_mixup=True,
    mixup_alpha=0.2,
    dtype=jnp.float32,
    sem_id_mining_margin=None,
    mined_loss_isolation=False,
) -> HRqVae:
    return HRqVae(
        dtype=dtype,
        input_dim=vae_input_dim,
        embed_dim=vae_embed_dim,
        hidden_dims=tuple(vae_hidden_dims),
        codebook_size=vae_codebook_size,
        codebook_normalize=vae_codebook_normalize,
        codebook_sim_vq=vae_sim_vq,
        codebook_mode=vae_codebook_mode,
        n_layers=vae_n_layers,
        commitment_weight=commitment_weight,
        n_cat_features=vae_n_cat_feats,
        tag_alignment_weight=tag_alignment_weight,
        tag_prediction_weight=tag_prediction_weight,
        tag_class_counts=tuple(tag_class_counts) if tag_class_counts else None,
        tag_embed_dim=tag_embed_dim,
        use_focal_loss=use_focal_loss,
        focal_gamma_base=focal_loss_gamma_base,
        focal_alpha_base=focal_loss_alpha_base,
        dropout_rate=dropout_rate,
        use_batch_norm=use_batch_norm,
        alignment_temperature=alignment_temperature,
        sem_id_uniqueness_weight=sem_id_uniqueness_weight,
        sem_id_uniqueness_margin=sem_id_uniqueness_margin,
        sem_id_mining_margin=sem_id_mining_margin,
        mined_loss_isolation=mined_loss_isolation,
        use_label_smoothing=use_label_smoothing,
        label_smoothing_alpha=label_smoothing_alpha,
        use_mixup=use_mixup,
        mixup_alpha=mixup_alpha,
    )


def make_train_step(model, tx, class_counts, gumbel_t: float,
                    n_mined_pairs: int = 0):
    """Build the jitted DP train step."""

    def train_step(state: TrainState, x, tags_emb, tags_indices, rng):
        r_gumbel, r_dropout, r_mixup = jax.random.split(rng, 3)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, tags_emb, tags_indices, gumbel_t,
                train=True,
                class_counts=class_counts,
                n_mined_pairs=n_mined_pairs,
                rngs={"gumbel": r_gumbel, "dropout": r_dropout, "mixup": r_mixup},
                mutable=["batch_stats"],
            )
            return out.loss, (out, updates["batch_stats"])

        (loss, (out, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads=grads, tx=tx, new_batch_stats=new_bs)
        metrics = {
            "loss": loss,
            "reconstruction_loss": out.reconstruction_loss,
            "rqvae_loss": out.rqvae_loss,
            "tag_align_loss": out.tag_align_loss,
            "tag_pred_loss": out.tag_pred_loss,
            "tag_pred_accuracy": out.tag_pred_accuracy,
            "p_unique_ids": out.p_unique_ids,
            "emb_norms": jnp.mean(out.embs_norm, axis=0),
            "tag_pred_accuracy_by_layer": out.tag_pred_accuracy_by_layer,
            "sem_id_uniqueness_loss": out.sem_id_uniqueness_loss,
            "mined_pair_collision_rate": out.mined_pair_collision_rate,
        }
        return new_state, metrics

    return train_step


def make_eval_step(model, class_counts, gumbel_t: float):
    def eval_step(params, batch_stats, x, tags_emb, tags_indices):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, tags_emb, tags_indices, gumbel_t,
            train=False,
            class_counts=class_counts,
        )
        return {
            "loss": out.loss,
            "reconstruction_loss": out.reconstruction_loss,
            "rqvae_loss": out.rqvae_loss,
            "tag_align_loss": out.tag_align_loss,
            "tag_pred_loss": out.tag_pred_loss,
            "tag_pred_accuracy": out.tag_pred_accuracy,
            "tag_pred_accuracy_by_layer": out.tag_pred_accuracy_by_layer,
        }

    return eval_step


def make_tta_predict(model, eval_tta: bool, eval_temperature: float, n_aug: int = 5):
    """TTA tag prediction: averaged temperature-softmax over noise-augmented
    passes (ref train_hidvae.py:864-1031)."""

    def predict(params, batch_stats, x, rng):
        variables = {"params": params, "batch_stats": batch_stats}

        def one_pass(noise_rng, scale):
            out = model.apply(
                variables, x,
                method=lambda m, x: m.predict_tags(
                    x, noise_rng=noise_rng, noise_scale=scale
                ),
            )
            return [jax.nn.softmax(l / eval_temperature, axis=-1) for l in out["logits"]]

        probs = one_pass(None, 0.0)
        if eval_tta:
            # Noise grows with augmentation index (ref train_hidvae.py:881-886:
            # noise_scale = 0.02 * aug_idx for aug_idx 1..4).
            for i in range(n_aug - 1):
                p = one_pass(jax.random.fold_in(rng, i), 0.02 * (i + 1))
                probs = [a + b for a, b in zip(probs, p)]
            probs = [p / n_aug for p in probs]
        return [jnp.argmax(p, axis=-1) for p in probs]

    return predict


def train(
    iterations=50_000,
    batch_size=64,
    learning_rate=0.0001,
    weight_decay=0.01,
    dataset_folder="dataset/synthetic",
    dataset=RecDataset.SYNTHETIC,
    pretrained_hrqvae_path=None,
    save_dir_root="out/",
    use_kmeans_init=True,
    split_batches=True,
    amp=False,
    do_eval=True,
    force_dataset_process=False,
    mixed_precision_type="bf16",
    gradient_accumulate_every=1,
    save_model_every=1_000,
    eval_every=5_000,
    commitment_weight=0.25,
    tag_alignment_weight=0.5,
    tag_prediction_weight=0.5,
    vae_n_cat_feats=18,
    vae_input_dim=768,
    vae_embed_dim=128,
    vae_hidden_dims=(512, 256),
    vae_codebook_size=512,
    vae_codebook_normalize=False,
    vae_codebook_mode=QuantizeForwardMode.GUMBEL_SOFTMAX,
    vae_sim_vq=False,
    vae_n_layers=3,
    dataset_split="beauty",
    tag_class_counts=None,
    tag_embed_dim=768,
    use_focal_loss=True,
    focal_loss_gamma_base=2.0,
    focal_loss_alpha_base=0.25,
    rare_tag_threshold=30,
    dropout_rate=0.3,
    use_batch_norm=True,
    alignment_temperature=0.1,
    predictor_weight_decay=0.02,
    layer_specific_lr=False,
    use_label_smoothing=True,
    label_smoothing_alpha=0.1,
    use_mixup=True,
    mixup_alpha=0.2,
    eval_tta=True,
    eval_temperature=0.8,
    ensemble_predictions=True,
    use_lr_scheduler=True,
    lr_scheduler_type="cosine",
    lr_scheduler_T_max=400_000,
    lr_scheduler_eta_min=1e-7,
    lr_scheduler_step_size=100_000,
    lr_scheduler_gamma=0.5,
    lr_scheduler_factor=0.5,
    lr_scheduler_patience=10,
    sem_id_uniqueness_weight=0.5,
    sem_id_uniqueness_margin=0.5,
    id_repetition_threshold=0.03,
    use_concatenated_ids=True,
    use_interleaved_ids=False,
    wandb_logging=False,
    # TPU-native extras (not in the reference surface):
    seed=42,
    log_every=100,
    eval_batches=None,
    make_plots=True,
    device_data_dtype="float32",
    sem_id_mining=False,
    sem_id_mining_frac=0.25,
    sem_id_mining_pool=32768,
    sem_id_mining_margin=None,
    sem_id_mining_isolate=False,
):
    """Train the HiD-VAE tokenizer. Returns a result dict with the final
    state, tokenizer, and metric history."""
    from hidvae_tpu.utils.runtime import configure_runtime

    configure_runtime()
    time_stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    save_dir = os.path.join(save_dir_root, f"hrqvae_{dataset.name}_{time_stamp}")
    _setup_logging(save_dir)
    log_operative_config(logger, dict(locals()))

    rng = jax.random.key(seed)
    np_rng = np.random.RandomState(seed)

    # ---- data ----
    train_dataset = ItemData(
        root=dataset_folder, dataset=dataset, force_process=force_dataset_process,
        train_test_split="train" if do_eval else "all", split=dataset_split,
    )
    eval_dataset = (
        ItemData(root=dataset_folder, dataset=dataset, train_test_split="eval",
                 split=dataset_split)
        if do_eval else None
    )
    index_dataset = ItemData(
        root=dataset_folder, dataset=dataset, train_test_split="all",
        split=dataset_split,
    )

    has_tags = train_dataset.has_tags
    if not has_tags:
        logger.warning("Dataset has no tags; disabling tag supervision.")
        tag_alignment_weight = 0.0
        tag_prediction_weight = 0.0

    class_counts = None
    rare_tags_dict = {}
    if has_tags:
        train_dataset.tags_emb, train_dataset.tags_indices = reconcile_tag_layers(
            train_dataset.tags_emb, train_dataset.tags_indices, vae_n_layers
        )
        if eval_dataset is not None:
            eval_dataset.tags_emb, eval_dataset.tags_indices = reconcile_tag_layers(
                eval_dataset.tags_emb, eval_dataset.tags_indices, vae_n_layers
            )
        if tag_class_counts is None:
            tag_class_counts = [
                int(train_dataset.tags_indices[:, i].max()) + 1
                for i in range(vae_n_layers)
            ]
        tag_class_counts = list(tag_class_counts)[:vae_n_layers]

        if use_focal_loss:
            new_counts, id_mappings, rare_tags_dict = compute_rare_tag_remap(
                train_dataset.tags_indices, tag_class_counts, rare_tag_threshold
            )
            train_dataset.tags_indices = apply_tag_remap(
                train_dataset.tags_indices, id_mappings
            )
            if eval_dataset is not None:
                eval_dataset.tags_indices = apply_tag_remap(
                    eval_dataset.tags_indices, id_mappings
                )
            tag_class_counts = new_counts
            logger.info(f"Rare-tag remap -> tag_class_counts={tag_class_counts}")
            os.makedirs(os.path.join(save_dir_root, "special_tags_files"), exist_ok=True)
            np.savez(
                os.path.join(save_dir_root, "special_tags_files", "rare_tags.npz"),
                **{str(k): v for k, v in rare_tags_dict.items()},
            )
            counts_np = post_remap_class_counts(
                train_dataset.tags_indices, tag_class_counts
            )
            class_counts = tuple(jnp.asarray(c) for c in counts_np)

    # ---- model ----
    # Stage-1 AMP (ref train_hidvae.py:77-80, autocast :702): amp=True runs
    # the MLP/tag-head matmuls in bf16 (fp16 requests map to bf16 on TPU);
    # the quantizer distance/argmin path and all losses stay fp32 so ID
    # assignments agree across train/eval/kernel. `ensemble_predictions` is
    # accepted for gin-surface parity but inert — in the reference the flag is
    # shadowed by a local variable and never read (train_hidvae.py:117 vs :920).
    compute_dtype = (
        jnp.bfloat16
        if (amp and str(mixed_precision_type).lower() in
            ("bf16", "bfloat16", "fp16", "float16"))
        else jnp.float32
    )
    model = build_model(
        dtype=compute_dtype,
        vae_input_dim=vae_input_dim,
        vae_embed_dim=vae_embed_dim,
        vae_hidden_dims=vae_hidden_dims,
        vae_codebook_size=vae_codebook_size,
        vae_codebook_normalize=vae_codebook_normalize,
        vae_sim_vq=vae_sim_vq,
        vae_codebook_mode=vae_codebook_mode,
        vae_n_layers=vae_n_layers,
        vae_n_cat_feats=vae_n_cat_feats,
        commitment_weight=commitment_weight,
        tag_alignment_weight=tag_alignment_weight,
        tag_prediction_weight=tag_prediction_weight,
        tag_class_counts=tag_class_counts,
        tag_embed_dim=tag_embed_dim,
        use_focal_loss=use_focal_loss,
        focal_loss_gamma_base=focal_loss_gamma_base,
        focal_loss_alpha_base=focal_loss_alpha_base,
        dropout_rate=dropout_rate,
        use_batch_norm=use_batch_norm,
        alignment_temperature=alignment_temperature,
        sem_id_uniqueness_weight=sem_id_uniqueness_weight,
        sem_id_uniqueness_margin=sem_id_uniqueness_margin,
        sem_id_mining_margin=sem_id_mining_margin,
        mined_loss_isolation=sem_id_mining_isolate,
        use_label_smoothing=use_label_smoothing,
        label_smoothing_alpha=label_smoothing_alpha,
        use_mixup=use_mixup,
        mixup_alpha=mixup_alpha,
    )

    # init
    ex = train_dataset.batch(np.arange(min(8, len(train_dataset))))
    rng, init_rng = jax.random.split(rng)
    variables = model.init(
        {"params": init_rng, "gumbel": jax.random.key(1),
         "dropout": jax.random.key(2), "mixup": jax.random.key(3)},
        jnp.asarray(ex.x),
        jnp.asarray(ex.tags_emb) if has_tags else None,
        jnp.asarray(ex.tags_indices) if has_tags else None,
        0.2,
        train=True,
        class_counts=class_counts,
    )
    batch_stats = variables.get("batch_stats", {})
    params = variables["params"]

    # ---- optimizer ----
    schedule = make_lr_schedule(
        learning_rate, use_lr_scheduler, lr_scheduler_type,
        lr_scheduler_T_max, lr_scheduler_eta_min,
        lr_scheduler_step_size, lr_scheduler_gamma,
    )
    # reduce_on_plateau is metric-driven: constant base LR + a host-stepped
    # multiplier living in opt_state (the reference declares this unsupported
    # and comments it out, ref train_hidvae.py:646-650; we implement the torch
    # semantics it intended, stepped on eval loss at each eval — the point the
    # reference defers its scheduler.step() to, ref :766).
    plateau = use_lr_scheduler and lr_scheduler_type == "reduce_on_plateau"
    plateau_ctl = (
        # min_scale=0 matches torch's ReduceLROnPlateau default (min_lr=0);
        # lr_scheduler_eta_min is cosine's knob and is NOT a plateau floor —
        # mapping it in would freeze (or worse, raise) any base LR below it.
        ReduceLROnPlateau(factor=lr_scheduler_factor,
                          patience=lr_scheduler_patience)
        if plateau else None
    )
    if plateau:
        logger.info(
            f"Using ReduceLROnPlateau scheduler: factor={lr_scheduler_factor}, "
            f"patience={lr_scheduler_patience} (stepped on eval loss)"
        )
    elif use_lr_scheduler and not callable(schedule):
        # Matches the reference's warn-and-continue for unknown types
        # (ref train_hidvae.py:651-653).
        logger.warning(
            f"Unsupported learning rate scheduler type: {lr_scheduler_type}. "
            f"Not using a scheduler."
        )
    tx = make_optimizer(
        schedule, weight_decay,
        gradient_accumulate_every=gradient_accumulate_every,
        layer_specific_lr=layer_specific_lr,
        predictor_weight_decay=predictor_weight_decay,
        n_layers=vae_n_layers,
        params_example=params,
        plateau=plateau,
    )

    start_iter = 0
    opt_state = None
    restored_mining_pairs = None
    if pretrained_hrqvae_path is not None:
        # Full-state resume: params + batch stats + optimizer state (incl.
        # MultiSteps accumulator and schedule counts) + step, matching the
        # reference's {iter, model, optimizer} dict (train_hidvae.py:621-628).
        example = {"params": params, "batch_stats": batch_stats,
                   "opt_state": tx.init(params), "step": jnp.zeros((), jnp.int32)}
        if sem_id_mining:
            # The mining pool is trainer STATE (it shapes every batch), so it
            # round-trips through the checkpoint like the optimizer state; the
            # -1 sentinel detects checkpoints from before pool persistence (or
            # a changed pool size), which fall back to the uniform seed below.
            example["mining_pairs"] = jnp.full(
                (sem_id_mining_pool, 2), -1, jnp.int32
            )
        restored = restore_checkpoint(pretrained_hrqvae_path, example)
        if sem_id_mining:
            cand = np.asarray(restored.get("mining_pairs"))
            if (cand >= 0).all() and int(cand.max()) < len(train_dataset):
                restored_mining_pairs = cand
                logger.info("Restored mining pool from checkpoint "
                            f"({len(cand)} pair slots)")
            else:
                logger.warning(
                    "Checkpoint has no usable mining pool; re-seeding uniform "
                    "until the next corpus audit")
        params = restored["params"]
        batch_stats = restored["batch_stats"]
        opt_state = restored["opt_state"]
        start_iter = int(restored["step"])
        if plateau_ctl is not None and restored.get("plateau") is not None:
            # Resume the host-side plateau counters (best/num_bad/cooldown)
            # so the LR-scale trajectory continues exactly where it left off;
            # the multiplier itself already rides in opt_state.
            plateau_ctl.load_state_dict(restored["plateau"])
            logger.info(
                f"Restored ReduceLROnPlateau state: {plateau_ctl.state_dict()}"
            )
        logger.info(f"Restored pretrained HRqVae from {pretrained_hrqvae_path} "
                    f"(iter {start_iter})")
    elif use_kmeans_init:
        n_init = min(20_000, len(train_dataset))
        init_batch = train_dataset.batch(np.arange(n_init))
        rng, km_rng = jax.random.split(rng)
        new_vars = kmeans_init_codebooks(
            model, {"params": params, "batch_stats": batch_stats},
            jnp.asarray(init_batch.x), km_rng,
        )
        params = new_vars["params"]
        logger.info("K-means codebook initialization complete")

    state = TrainState(
        step=jnp.asarray(start_iter, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state if opt_state is not None else tx.init(params),
    )

    # ---- mesh + jit ----
    mesh = make_mesh()
    b_shard = batch_sharding(mesh)
    r_shard = replicated_sharding(mesh)
    state = jax.device_put(state, r_shard)

    # Accelerate split_batches semantics (ref train_hidvae.py:76,187):
    # True  -> batch_size is the GLOBAL batch, split across data shards;
    # False -> batch_size is per-shard, global batch scales with the mesh.
    if not split_batches and mesh.shape["data"] > 1:
        batch_size = batch_size * mesh.shape["data"]
        logger.info(f"split_batches=False: global batch = {batch_size} "
                    f"({mesh.shape['data']} data shards)")

    gumbel_t = 0.2  # fixed by the reference trainers (train_hidvae.py:690)
    n_pair_rows = (
        int(batch_size * sem_id_mining_frac) // 2 if sem_id_mining else 0
    )
    train_step = jax.jit(
        make_train_step(model, tx, class_counts, gumbel_t,
                        n_mined_pairs=n_pair_rows),
        donate_argnums=(0,),
    )
    eval_step = jax.jit(make_eval_step(model, class_counts, gumbel_t))
    tta_predict = jax.jit(
        make_tta_predict(model, eval_tta, eval_temperature)
    ) if has_tags else None

    n_data = mesh.shape["data"]

    history = {k: [] for k in [
        "iterations", "total_loss", "reconstruction_loss", "rqvae_loss",
        "tag_align_loss", "tag_pred_loss", "tag_pred_accuracy",
        "eval_iterations", "eval_total_loss", "eval_tag_pred_accuracy",
        "rqvae_entropy", "max_id_duplicates", "repetition_rate",
    ]}
    history["emb_norms"] = [[] for _ in range(vae_n_layers)]
    history["codebook_usage"] = [[] for _ in range(vae_n_layers)]

    best_eval_accuracy = 0.0
    saved_paths = []
    t_start = time.time()
    total_steps = iterations * gradient_accumulate_every

    # Device-resident pipeline: the whole item corpus lives in HBM and each
    # step samples its own batch inside a scan-chunked jitted program (see
    # hidvae_tpu.train.device_data). The host only logs and checkpoints.
    from hidvae_tpu.train.device_data import DeviceItemData

    # Storage dtype for the device-resident training data (TPU-native extra;
    # the reference streams fp32 batches from a host DataLoader every step).
    # 'bfloat16' halves the HBM footprint of the feature/tag-embedding tables
    # — the lever that fits a 1M-item corpus (3 GB features + 9 GB tag
    # embeddings in fp32) next to the model on one 16 GB v5e chip. Under AMP
    # the matmuls consume bf16 anyway; the quantizer/losses still compute in
    # fp32 on the (bf16-rounded) gathered values. Eval/k-means/index-audit
    # paths stay fp32 host-side.
    ddtype = jnp.bfloat16 if str(device_data_dtype).lower() in (
        "bf16", "bfloat16") else jnp.float32
    # Duplicate-pair mining (TPU-native extra; device_data.py docstring): at
    # each corpus audit the colliding item pairs are harvested into a
    # fixed-shape device pool, and a fraction of every batch is drawn from it
    # — guaranteed in-batch ID collisions, so the uniqueness loss gets a
    # signal that scales with the corpus instead of the ~B/N batch-birthday
    # rate. Zero recompiles: the pool is a fixed-shape leaf of the `data` jit
    # argument, seeded uniform (≈ plain sampling) until the first audit. On
    # resume the pool restores from checkpoint meta (arrays payload), so a
    # resumed mining run trains against the exact pool it saved with — the
    # same bit-identical-resume standard as params/opt_state (PARITY #18).
    init_pairs = None
    if n_pair_rows:
        if restored_mining_pairs is not None:
            init_pairs = jnp.asarray(restored_mining_pairs, jnp.int32)
        else:
            init_pairs = jnp.asarray(
                np_rng.randint(0, len(train_dataset), (sem_id_mining_pool, 2)),
                jnp.int32,
            )
    if n_pair_rows:
        logger.info(
            f"Semantic-ID duplicate mining ON: {n_pair_rows} pairs/batch "
            f"({2 * n_pair_rows}/{batch_size} rows), pool {sem_id_mining_pool}"
        )
    ddata = DeviceItemData(
        x=jnp.asarray(train_dataset.item_features, ddtype),
        tags_emb=(jnp.asarray(train_dataset.tags_emb, ddtype)
                  if has_tags else None),
        tags_indices=jnp.asarray(train_dataset.tags_indices) if has_tags else None,
        mining_pairs=init_pairs,
    )
    # Evals/saves fire at chunk boundaries, so the chunk must not be coarser
    # than ANY host-side cadence — eval_every=1 with the default log_every=100
    # would otherwise eval 100× too rarely.
    chunk = max(1, min(log_every, eval_every, save_model_every, total_steps))

    def shard_dp(t):
        """Split sampled batches over the data axis (XLA partitions the gather)."""
        if t is None or n_data <= 1 or t.shape[0] % n_data != 0:
            return t
        return jax.lax.with_sharding_constraint(t, b_shard)

    # Per-step randomness is a pure function of (seed, global step) so a
    # resumed run replays the identical batch/gumbel/dropout stream — required
    # for resume equivalence (train 2N == train N; save; restore; train N).
    step_root = jax.random.fold_in(jax.random.key(seed), 0x5EED)

    # `data` is a jit ARGUMENT, not a closure capture: closed-over device
    # arrays are baked into the lowered program as constants (2.3 GB at
    # 200k-item scale — slow remote compiles, duplicated HBM), while arguments
    # are passed by reference at dispatch time.
    @partial(jax.jit, donate_argnums=(0,))
    def train_chunk(state, data, it0):
        def body(carry, i):
            r_sample, r_step = jax.random.split(jax.random.fold_in(step_root, it0 + i))
            x, te, ti = data.sample(r_sample, batch_size, n_pair_rows)
            new_state, metrics = train_step(
                carry, shard_dp(x), shard_dp(te), shard_dp(ti), r_step
            )
            return new_state, metrics

        return jax.lax.scan(body, state, jnp.arange(chunk))

    # Sliding-window(1000) loss means matching the reference's train-log
    # reporting (ref train_hidvae.py:741-758).
    from collections import deque

    loss_window = deque(maxlen=1000)

    it = start_iter
    while it < start_iter + total_steps:
        n_now = min(chunk, start_iter + total_steps - it)
        if n_now == chunk:
            state, mstack = train_chunk(state, ddata, jnp.asarray(it, jnp.int32))
        else:  # ragged tail chunk
            for j in range(n_now):
                r_s, r_t = jax.random.split(jax.random.fold_in(step_root, it + j))
                x, te, ti = ddata.sample(r_s, batch_size, n_pair_rows)
                state, metrics = train_step(state, x, te, ti, r_t)
            mstack = jax.tree_util.tree_map(
                lambda v: v[None] if v is not None else None, metrics
            )
        prev_it, it = it, it + n_now

        m = {
            k: np.asarray(v)[-1] for k, v in mstack.items() if v is not None
        }
        loss_window.extend(np.asarray(mstack["loss"]).tolist())
        window_loss = float(np.mean(loss_window))
        history["iterations"].append(it - 1)
        history["total_loss"].append(float(m["loss"]))
        history["reconstruction_loss"].append(float(m["reconstruction_loss"]))
        history["rqvae_loss"].append(float(m["rqvae_loss"]))
        history["tag_align_loss"].append(float(m["tag_align_loss"]))
        history["tag_pred_loss"].append(float(m["tag_pred_loss"]))
        history["tag_pred_accuracy"].append(float(m["tag_pred_accuracy"]))
        for l in range(vae_n_layers):
            history["emb_norms"][l].append(float(m["emb_norms"][l]))
        logger.info(
            f"iter {it - 1}: loss={m['loss']:.4f} (window mean {window_loss:.4f}) "
            f"recon={m['reconstruction_loss']:.4f} rq={m['rqvae_loss']:.4f} "
            f"align={m['tag_align_loss']:.4f} pred={m['tag_pred_loss']:.4f} "
            f"acc={m['tag_pred_accuracy']:.4f} p_unique={m['p_unique_ids']:.4f} "
            + (f"mined_coll={m['mined_pair_collision_rate']:.3f} "
               if n_pair_rows else "")
            + f"({(it - start_iter) * batch_size / (time.time() - t_start):.0f} items/s)"
        )

        def crossed(every):
            return (prev_it // every) != (it // every) or it == start_iter + total_steps

        do_eval_now = do_eval and crossed(eval_every)
        do_save_now = crossed(save_model_every)
        last_audit = (None, None)  # (iteration, repetition) of this step's audit

        if do_eval_now and eval_dataset is not None and len(eval_dataset) > 0:
            eval_metrics = _run_eval(
                eval_step, tta_predict, eval_dataset, batch_size, has_tags,
                eval_batches, rng, state.params, state.batch_stats,
            )
            history["eval_iterations"].append(it)
            history["eval_total_loss"].append(eval_metrics["loss"])
            history["eval_tag_pred_accuracy"].append(eval_metrics["tag_pred_accuracy"])
            logger.info(f"eval @ {it}: {eval_metrics}")

            if plateau_ctl is not None:
                old_scale = plateau_ctl.scale
                new_scale = plateau_ctl.step(eval_metrics["loss"])
                if new_scale != old_scale:
                    state = state.replace(
                        opt_state=set_plateau_scale(state.opt_state, new_scale)
                    )
                    logger.info(
                        f"ReduceLROnPlateau: eval loss plateaued, LR scale "
                        f"{old_scale:.3g} -> {new_scale:.3g} "
                        f"(lr = {learning_rate * new_scale:.3g})"
                    )

            # Corpus ID diversity audit (ref train_hidvae.py:1111-1142).
            tokenizer = HSemanticIdTokenizer(
                model, {"params": state.params, "batch_stats": state.batch_stats},
                n_layers=vae_n_layers, codebook_size=vae_codebook_size,
                tag_class_counts=tag_class_counts,
            )
            corpus_ids = np.asarray(
                tokenizer.precompute_corpus_ids(index_dataset.item_features)
            )
            div = id_diversity_metrics(corpus_ids, vae_codebook_size, vae_n_layers)
            if n_pair_rows:
                from hidvae_tpu.train.device_data import harvest_duplicate_pairs

                # The harvest subsample is seeded by (seed, audit step), not
                # the trainer's running host RNG, so the pool after an audit
                # is a pure function of the corpus IDs at that step — a
                # resumed run that re-audits at the same step harvests the
                # identical pool (resume equivalence across audit boundaries).
                pairs = harvest_duplicate_pairs(
                    corpus_ids, train_dataset.indices, sem_id_mining_pool,
                    np.random.RandomState((seed * 1_000_003 + it) % (2 ** 31)),
                )
                if pairs is not None:
                    ddata = ddata._replace(mining_pairs=jnp.asarray(pairs))
                    logger.info(
                        f"Mining pool refreshed from audit @ {it}: "
                        f"{len(pairs)} pair slots"
                    )
            history["rqvae_entropy"].append(div["rqvae_entropy"])
            history["max_id_duplicates"].append(div["max_id_duplicates"])
            history["repetition_rate"].append(div["repetition_rate"])
            for l in range(vae_n_layers):
                history["codebook_usage"][l].append(div["codebook_usage"][l])
            logger.info(f"diversity @ {it}: {div}")

            eval_acc = eval_metrics.get(
                "tta_accuracy", eval_metrics.get("tag_pred_accuracy", 0.0)
            )
            rep = div["repetition_rate"]
            last_audit = (it, rep)
            # Quality-gated checkpoint (ref train_hidvae.py:1145-1177).
            gate_ok = (not has_tags or eval_acc > 0.60) and rep < id_repetition_threshold
            if do_save_now or gate_ok:
                if gate_ok and eval_acc >= best_eval_accuracy:
                    best_eval_accuracy = eval_acc
                    name = (
                        f"hrqvae_ACC{eval_acc:.4f}_"
                        f"RQLOSS{eval_metrics['rqvae_loss']:.4f}_DUPR{rep:.4f}"
                    )
                    path = _save(save_dir, name, state, model, eval_metrics,
                                 rep, plateau_ctl,
                                 ddata.mining_pairs if n_pair_rows else None)
                    saved_paths.append(path)
                    logger.info(f"Gated checkpoint saved: {path}")
        if do_save_now:
            # Record this step's diversity audit (when one just ran) so the
            # stage-2 corpus-collapse guard also covers `latest` restores; a
            # stale audit is never recorded (rep=None disables the guard
            # rather than risking a false collapse error).
            rep_now = last_audit[1] if last_audit[0] == it else None
            path = _save(save_dir, "latest", state, model, {}, rep_now,
                         plateau_ctl,
                         ddata.mining_pairs if n_pair_rows else None)
            saved_paths.append(path)

    if make_plots:
        try:
            from hidvae_tpu.train.plots import plot_hidvae_history

            plot_hidvae_history(history, os.path.join(save_dir, "plots"))
        except Exception as e:  # plotting must never kill a training run
            logger.warning(f"Plotting failed: {e}")

    return {
        "state": state,
        "model": model,
        "save_dir": save_dir,
        "history": history,
        "tag_class_counts": tag_class_counts,
        "rare_tags": rare_tags_dict,
        "best_eval_accuracy": best_eval_accuracy,
        "saved_paths": saved_paths,
    }


def _run_eval(eval_step, tta_predict, eval_dataset, batch_size, has_tags,
              eval_batches, rng, params, batch_stats):
    """Eval-loss sweep + TTA tag-accuracy report (ref train_hidvae.py:810-1031)."""
    sums, n = {}, 0
    tta_correct = tta_valid = None
    for bi, batch in enumerate(eval_dataset.iter_eval_batches(batch_size)):
        if eval_batches is not None and bi >= eval_batches:
            break
        x = jnp.asarray(batch.x)
        te = jnp.asarray(batch.tags_emb) if has_tags else None
        ti = jnp.asarray(batch.tags_indices) if has_tags else None
        m = eval_step(params, batch_stats, x, te, ti)
        for k, v in m.items():
            if v is None:
                continue
            v = np.asarray(v, np.float64)
            if v.ndim == 0:
                sums[k] = sums.get(k, 0.0) + float(v) * len(batch.x)
        n += len(batch.x)

        if tta_predict is not None:
            preds = tta_predict(params, batch_stats, x, rng)   # list of [B] per tag level
            tgt = np.asarray(batch.tags_indices)               # [B, >= n_tag_levels]
            pred_mat = np.stack([np.asarray(p) for p in preds], axis=1)
            # Untagged extra quantization levels (n_layers > tag depth) have
            # no predictions; their padded -1 targets are dropped here.
            tgt = tgt[:, : pred_mat.shape[1]]
            valid = tgt >= 0
            correct = (pred_mat == tgt) & valid
            if tta_correct is None:
                tta_correct = correct.sum(0).astype(np.float64)
                tta_valid = valid.sum(0).astype(np.float64)
            else:
                tta_correct += correct.sum(0)
                tta_valid += valid.sum(0)

    out = {k: v / max(n, 1) for k, v in sums.items()}
    if tta_correct is not None:
        per_layer = tta_correct / np.maximum(tta_valid, 1.0)
        out["tta_accuracy_by_layer"] = per_layer.tolist()
        out["tta_accuracy"] = float(per_layer.mean())
    return out


def _save(save_dir, name, state, model, eval_metrics, rep, plateau_ctl=None,
          mining_pairs=None):
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        # Full structural config so stage 2 can rebuild the frozen tokenizer
        # with the exact forward semantics it was trained with
        # (common.reconcile_vae_config; ref train_rqvae.py:302-313 saves
        # model_config for the same purpose).
        "model_config": structural_model_config(model),
        "metrics": {**eval_metrics, "repetition_rate": rep},
    }
    if plateau_ctl is not None:
        payload["plateau"] = plateau_ctl.state_dict()
    if mining_pairs is not None:
        # Duplicate-mining pool: trainer state, restored on resume (PARITY #18).
        payload["mining_pairs"] = mining_pairs
    return save_checkpoint(save_dir, name, payload)
