"""Stage-1 trainer for the plain RQ-VAE tokenizer.

Parity: reference train_rqvae.py `train()` (gin surface mirrored). Same
skeleton as the HiD-VAE trainer minus tag supervision: cycled item batches,
k-means init at iter 0, fixed gumbel t=0.2, gradient accumulation, periodic
eval-loss sweep + ID-diversity audit through the (reference-missing, here
first-class) plain SemanticIdTokenizer, checkpoints every save_model_every
(ref train_rqvae.py:300-343).
"""

import logging
import os
import time
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from hidvae_tpu.data.processed import ItemData, RecDataset
from hidvae_tpu.models.quantize import QuantizeForwardMode
from hidvae_tpu.models.rqvae import RqVae
from hidvae_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from hidvae_tpu.tokenizer.semids import SemanticIdTokenizer
from hidvae_tpu.train.common import (
    TrainState,
    id_diversity_metrics,
    log_operative_config,
    make_lr_schedule,
    make_optimizer,
    restore_checkpoint,
    save_checkpoint,
    structural_model_config,
)
from hidvae_tpu.train.init import kmeans_init_codebooks

logger = logging.getLogger("hidvae_tpu.train.rqvae")


def train(
    iterations=50_000,
    batch_size=64,
    learning_rate=0.0001,
    weight_decay=0.01,
    max_grad_norm=None,  # optional global-norm clip (TPU-native extra; ref does not clip)
    dataset_folder="dataset/synthetic",
    dataset=RecDataset.SYNTHETIC,
    pretrained_rqvae_path=None,
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
    vae_n_cat_feats=18,
    vae_input_dim=768,
    vae_embed_dim=32,
    vae_hidden_dims=(512, 256, 128),
    vae_codebook_size=256,
    vae_codebook_normalize=False,
    vae_codebook_mode=QuantizeForwardMode.GUMBEL_SOFTMAX,
    vae_sim_vq=False,
    vae_n_layers=3,
    dataset_split="beauty",
    use_dedup_dim=False,
    wandb_logging=False,
    # TPU-native extras:
    seed=42,
    log_every=100,
    eval_batches=None,
    make_plots=True,
):
    from hidvae_tpu.utils.runtime import configure_runtime

    configure_runtime()
    time_stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    save_dir = os.path.join(save_dir_root, f"rqvae_{dataset.name}_{time_stamp}")
    from hidvae_tpu.train.hidvae import _setup_logging

    _setup_logging(save_dir)
    log_operative_config(logger, dict(locals()))

    rng = jax.random.key(seed)
    np_rng = np.random.RandomState(seed)

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

    # Stage-1 AMP (ref train_rqvae.py amp/mixed_precision_type, Accelerate
    # autocast): bf16 matmuls when amp=True; quantizer + losses stay fp32.
    compute_dtype = (
        jnp.bfloat16
        if (amp and str(mixed_precision_type).lower() in
            ("bf16", "bfloat16", "fp16", "float16"))
        else jnp.float32
    )
    model = RqVae(
        dtype=compute_dtype,
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
    )

    ex = jnp.asarray(train_dataset.batch(np.arange(min(8, len(train_dataset)))).x)
    rng, init_rng = jax.random.split(rng)
    variables = model.init(
        {"params": init_rng, "gumbel": jax.random.key(1)}, ex, 0.2, train=True
    )
    params = variables["params"]

    schedule = make_lr_schedule(learning_rate)
    tx = make_optimizer(
        schedule, weight_decay, gradient_accumulate_every=gradient_accumulate_every,
        max_grad_norm=max_grad_norm,
    )

    start_iter = 0
    opt_state = None
    if pretrained_rqvae_path is not None:
        # Full-state resume: params + optimizer state (incl. any MultiSteps
        # accumulator and schedule counts) + step (ref train_rqvae.py:176-182,
        # 302-313).
        restored = restore_checkpoint(
            pretrained_rqvae_path,
            {"params": params, "opt_state": tx.init(params),
             "step": jnp.zeros((), jnp.int32)},
        )
        params = restored["params"]
        opt_state = restored["opt_state"]
        start_iter = int(restored["step"])
        logger.info(f"Restored RqVae from {pretrained_rqvae_path} (iter {start_iter})")
    elif use_kmeans_init:
        n_init = min(20_000, len(train_dataset))
        init_x = jnp.asarray(train_dataset.batch(np.arange(n_init)).x)
        rng, km_rng = jax.random.split(rng)
        params = kmeans_init_codebooks(model, {"params": params}, init_x, km_rng)["params"]
        logger.info("K-means codebook initialization complete")

    state = TrainState(
        step=jnp.asarray(start_iter, jnp.int32),
        params=params,
        batch_stats={},
        opt_state=opt_state if opt_state is not None else tx.init(params),
    )

    mesh = make_mesh()
    b_shard, r_shard = batch_sharding(mesh), replicated_sharding(mesh)
    n_data = mesh.shape["data"]
    state = jax.device_put(state, r_shard)

    # Accelerate split_batches semantics (ref train_rqvae.py:114-117): False
    # means batch_size is per-shard, so the global batch scales with the mesh.
    if not split_batches and n_data > 1:
        batch_size = batch_size * n_data
        logger.info(f"split_batches=False: global batch = {batch_size} "
                    f"({n_data} data shards)")

    gumbel_t = 0.2

    @jax.jit
    def train_step(state, x, rng):
        def loss_fn(p):
            out = model.apply(
                {"params": p}, x, gumbel_t, train=True, rngs={"gumbel": rng}
            )
            return out.loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads, tx=tx)
        return new_state, {
            "loss": loss,
            "reconstruction_loss": out.reconstruction_loss,
            "rqvae_loss": out.rqvae_loss,
            "p_unique_ids": out.p_unique_ids,
            "emb_norms": jnp.mean(out.embs_norm, axis=0),
        }

    @jax.jit
    def eval_step(params, x):
        out = model.apply({"params": params}, x, gumbel_t, train=False)
        return {
            "loss": out.loss,
            "reconstruction_loss": out.reconstruction_loss,
            "rqvae_loss": out.rqvae_loss,
        }

    history = {k: [] for k in [
        "iterations", "total_loss", "reconstruction_loss", "rqvae_loss",
        "eval_iterations", "eval_total_loss", "rqvae_entropy",
        "max_id_duplicates", "repetition_rate",
    ]}
    saved_paths = []
    t_start = time.time()
    total_steps = iterations * gradient_accumulate_every

    # Device-resident pipeline (see hidvae_tpu.train.device_data): the item
    # corpus lives in HBM; each step samples its batch inside a scan-chunked
    # jitted program.
    from functools import partial

    from hidvae_tpu.train.device_data import DeviceItemData

    ddata = DeviceItemData(
        x=jnp.asarray(train_dataset.item_features), tags_emb=None, tags_indices=None
    )
    # Evals/saves fire at chunk boundaries, so the chunk must not be coarser
    # than any host-side cadence (see train/hidvae.py).
    chunk = max(1, min(log_every, eval_every, save_model_every, total_steps))

    def shard_dp(t):
        if n_data <= 1 or t.shape[0] % n_data != 0:
            return t
        return jax.lax.with_sharding_constraint(t, b_shard)

    # Per-step randomness is a pure function of (seed, global step) so a
    # resumed run replays the identical batch/gumbel stream — required for the
    # resume-equivalence guarantee (train 2N == train N; save; restore; train N).
    step_root = jax.random.fold_in(jax.random.key(seed), 0x5EED)

    # `ddata` is a jit ARGUMENT, not a closure capture: closed-over device
    # arrays are baked into the lowered program as constants (multi-GB at
    # 200k-item scale — slow remote compiles, duplicated HBM), while arguments
    # are passed by reference at dispatch time.
    @partial(jax.jit, donate_argnums=(0,))
    def train_chunk(state, data, it0):
        def body(carry, i):
            r_sample, r_step = jax.random.split(jax.random.fold_in(step_root, it0 + i))
            x, _, _ = data.sample(r_sample, batch_size)
            return train_step(carry, shard_dp(x), r_step)

        return jax.lax.scan(body, state, jnp.arange(chunk))

    # Sliding-window(1000) loss means (ref train_rqvae.py:226-232).
    from collections import deque

    loss_window = deque(maxlen=1000)

    it = start_iter
    last_audit = (None, None)  # (iteration, diversity dict) of the newest audit
    while it < start_iter + total_steps:
        n_now = min(chunk, start_iter + total_steps - it)
        if n_now == chunk:
            state, mstack = train_chunk(state, ddata, jnp.asarray(it, jnp.int32))
        else:
            for j in range(n_now):
                r_s, r_t = jax.random.split(jax.random.fold_in(step_root, it + j))
                x, _, _ = ddata.sample(r_s, batch_size)
                state, m = train_step(state, x, r_t)
            mstack = jax.tree_util.tree_map(lambda v: v[None], m)
        prev_it, it = it, it + n_now

        mm = {k: float(np.asarray(v)[-1].mean()) for k, v in mstack.items()}
        loss_window.extend(np.asarray(mstack["loss"]).reshape(-1).tolist())
        history["iterations"].append(it - 1)
        history["total_loss"].append(mm["loss"])
        history["reconstruction_loss"].append(mm["reconstruction_loss"])
        history["rqvae_loss"].append(mm["rqvae_loss"])
        logger.info(
            f"iter {it - 1}: loss={mm['loss']:.4f} "
            f"(window mean {float(np.mean(loss_window)):.4f}) "
            f"recon={mm['reconstruction_loss']:.4f} "
            f"rq={mm['rqvae_loss']:.4f} p_unique={mm['p_unique_ids']:.4f} "
            f"({(it - start_iter) * batch_size / (time.time() - t_start):.0f} items/s)"
        )

        def crossed(every):
            return (prev_it // every) != (it // every) or it == start_iter + total_steps

        def audit_diversity():
            # ID-diversity audit through the plain tokenizer
            # (ref train_rqvae.py:316-343).
            tokenizer = SemanticIdTokenizer(
                model, {"params": state.params},
                n_layers=vae_n_layers, codebook_size=vae_codebook_size,
                use_dedup_dim=use_dedup_dim,
            )
            corpus = np.asarray(
                tokenizer.precompute_corpus_ids(index_dataset.item_features)
            )
            sem_cols = corpus[:, :vae_n_layers]
            div = id_diversity_metrics(sem_cols, vae_codebook_size, vae_n_layers)
            if use_dedup_dim:
                div["max_duplicates"] = int(corpus[:, -1].max()) + 1
            return div

        if do_eval and crossed(eval_every):
            if eval_dataset is not None and len(eval_dataset) > 0:
                sums, n = {}, 0
                for bi, eb in enumerate(eval_dataset.iter_eval_batches(batch_size)):
                    if eval_batches is not None and bi >= eval_batches:
                        break
                    em = eval_step(state.params, jnp.asarray(eb.x))
                    for k, v in em.items():
                        sums[k] = sums.get(k, 0.0) + float(np.asarray(v)) * len(eb.x)
                    n += len(eb.x)
                eval_metrics = {k: v / max(n, 1) for k, v in sums.items()}
                history["eval_iterations"].append(it)
                history["eval_total_loss"].append(eval_metrics["loss"])
                logger.info(f"eval @ {it}: {eval_metrics}")

            div = audit_diversity()
            history["rqvae_entropy"].append(div["rqvae_entropy"])
            history["max_id_duplicates"].append(div["max_id_duplicates"])
            history["repetition_rate"].append(div["repetition_rate"])
            last_audit = (it, div)
            logger.info(f"diversity @ {it}: {div}")

        if crossed(save_model_every):
            # Record a diversity audit of THESE params so a stage-2 consumer's
            # corpus-collapse guard (common.corpus_collapse_error) can compare
            # its rebuilt index against what this checkpoint actually produced.
            # Re-audit unless one just ran this step: a stale audit (eval_every
            # misaligned with save_model_every) could blame a faithful stage-2
            # rebuild for a collapse that happened after the last audit.
            if last_audit[0] != it:
                last_audit = (it, audit_diversity())
                logger.info(f"diversity @ save {it}: {last_audit[1]}")
            div = last_audit[1]
            metrics = {"repetition_rate": div["repetition_rate"],
                       "rqvae_entropy": div["rqvae_entropy"]}
            payload = {
                "step": state.step,
                "params": state.params,
                "opt_state": state.opt_state,
                "model_config": structural_model_config(model),
                "metrics": metrics,
            }
            saved_paths.append(save_checkpoint(save_dir, f"checkpoint_{it - 1}", payload))

    if make_plots:
        try:
            from hidvae_tpu.train.plots import plot_rqvae_history

            plot_rqvae_history(history, os.path.join(save_dir, "plots"))
        except Exception as e:
            logger.warning(f"Plotting failed: {e}")

    return {
        "state": state,
        "model": model,
        "save_dir": save_dir,
        "history": history,
        "saved_paths": saved_paths,
    }
