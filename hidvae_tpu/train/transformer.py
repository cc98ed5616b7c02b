"""Stage-2 trainer: transformer retrieval decoder on frozen-tokenizer IDs.

Parity: reference train_transformer.py `train()` (gin surface mirrored).
Pipeline: ItemData + SeqData(train subsampled / eval full) -> tokenizer
(HSemanticIdTokenizer or the plain SemanticIdTokenizer, selected by
use_h_tokenizer) restored from a stage-1 checkpoint -> precompute_corpus_ids +
ID repetition audit -> EncoderDecoderRetrievalModel + AdamW +
inverse-sqrt(warmup 10k) schedule -> train loop (tokenize batch -> CE loss) ->
partial eval (loss) every partial_eval_every -> full eval every
full_eval_every: constrained beam generation scored with TopK/NDCG
accumulators per digit and prefix (ref train_transformer.py:382-383, 802-819).

TPU design: tokenization is a device-side gather against the precomputed
corpus table inside the same jitted step; generation is the fixed-shape beam
search of hidvae_tpu.models.retrieval with the sorted-corpus verifier.
"""

import logging
import os
import time
from datetime import datetime
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hidvae_tpu.data.processed import ItemData, RecDataset, SeqData
from hidvae_tpu.data.schemas import SeqBatch
from hidvae_tpu.evaluate.metrics import NDCGAccumulator, TopKAccumulator
from hidvae_tpu.models.quantize import QuantizeForwardMode
from hidvae_tpu.models.retrieval import EncoderDecoderRetrievalModel
from hidvae_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from hidvae_tpu.tokenizer import HSemanticIdTokenizer, SemanticIdTokenizer
from hidvae_tpu.train.common import (
    TrainState,
    audit_rebuilt_corpus,
    inverse_sqrt_schedule,
    load_checkpoint_model_config,
    log_operative_config,
    make_optimizer,
    reconcile_vae_config,
    restore_checkpoint,
    save_checkpoint,
)
from hidvae_tpu.train.hidvae import build_model as build_hrqvae

logger = logging.getLogger("hidvae_tpu.train.transformer")


def _build_tokenizer(
    *,
    use_h_tokenizer,
    pretrained_rqvae_path,
    vae_input_dim,
    vae_embed_dim,
    vae_hidden_dims,
    vae_codebook_size,
    vae_n_layers,
    vae_n_cat_feats,
    vae_codebook_normalize,
    vae_sim_vq,
    tag_alignment_weight,
    tag_prediction_weight,
    tag_class_counts,
    tag_embed_dim,
    use_dedup_dim,
    use_concatenated_ids,
    use_interleaved_ids,
    commitment_weight,
    rng,
):
    """Instantiate the frozen stage-1 model + tokenizer service
    (ref train_transformer.py:222-270).

    Structural VAE params are reconciled against the checkpoint's recorded
    model_config before the model is built: a decoder config that omits e.g.
    vae_codebook_normalize (the reference's committed decoder_kuairand.gin
    does, while its stage 1 sets it) would otherwise rebuild the quantizer
    with wrong distance semantics — identical parameter shapes, silently
    collapsed corpus IDs. Checkpoint values win, loudly.
    """
    if pretrained_rqvae_path is not None:
        rec = reconcile_vae_config(
            pretrained_rqvae_path,
            {
                "input_dim": vae_input_dim,
                "embed_dim": vae_embed_dim,
                "hidden_dims": list(vae_hidden_dims),
                "codebook_size": vae_codebook_size,
                "codebook_normalize": vae_codebook_normalize,
                "codebook_sim_vq": vae_sim_vq,
                "n_layers": vae_n_layers,
                "n_cat_features": vae_n_cat_feats,
                "tag_class_counts": (
                    list(tag_class_counts) if tag_class_counts is not None else None
                ),
                "tag_embed_dim": tag_embed_dim,
            },
            logger,
        )
        vae_input_dim = rec["input_dim"]
        vae_embed_dim = rec["embed_dim"]
        vae_hidden_dims = rec["hidden_dims"]
        vae_codebook_size = rec["codebook_size"]
        vae_codebook_normalize = rec["codebook_normalize"]
        vae_sim_vq = rec["codebook_sim_vq"]
        vae_n_layers = rec["n_layers"]
        vae_n_cat_feats = rec["n_cat_features"]
        tag_class_counts = rec["tag_class_counts"]
        tag_embed_dim = rec["tag_embed_dim"]
    if use_h_tokenizer:
        model = build_hrqvae(
            vae_input_dim=vae_input_dim,
            vae_embed_dim=vae_embed_dim,
            vae_hidden_dims=vae_hidden_dims,
            vae_codebook_size=vae_codebook_size,
            vae_codebook_normalize=vae_codebook_normalize,
            vae_sim_vq=vae_sim_vq,
            vae_codebook_mode=QuantizeForwardMode.GUMBEL_SOFTMAX,
            vae_n_layers=vae_n_layers,
            vae_n_cat_feats=vae_n_cat_feats,
            commitment_weight=commitment_weight,
            tag_alignment_weight=tag_alignment_weight,
            tag_prediction_weight=tag_prediction_weight,
            tag_class_counts=tag_class_counts,
            tag_embed_dim=tag_embed_dim,
            use_focal_loss=False,
            focal_loss_gamma_base=2.0,
            focal_loss_alpha_base=0.25,
            dropout_rate=0.2,
            use_batch_norm=True,
            alignment_temperature=0.1,
            sem_id_uniqueness_weight=0.5,
            sem_id_uniqueness_margin=0.5,
        )
        x = jnp.zeros((2, vae_input_dim))
        te = jnp.zeros((2, vae_n_layers, tag_embed_dim))
        ti = jnp.zeros((2, vae_n_layers), jnp.int32)
        variables = model.init(
            {"params": rng, "gumbel": jax.random.key(1),
             "dropout": jax.random.key(2), "mixup": jax.random.key(3)},
            x, te, ti, 0.2, train=False,
        )
        variables = dict(variables)
        if pretrained_rqvae_path is not None:
            restored = restore_checkpoint(
                pretrained_rqvae_path,
                {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {}),
                 "step": jnp.zeros((), jnp.int32)},
            )
            variables["params"] = restored["params"]
            variables["batch_stats"] = restored["batch_stats"]
        return HSemanticIdTokenizer(
            model, variables,
            n_layers=vae_n_layers, codebook_size=vae_codebook_size,
            tag_class_counts=tag_class_counts,
            use_dedup_dim=use_dedup_dim,
            use_concatenated_ids=use_concatenated_ids,
            use_interleaved_ids=use_interleaved_ids,
        )
    # Plain RQ-VAE tokenizer (the reference's missing semids.py path).
    from hidvae_tpu.models.rqvae import RqVae

    model = RqVae(
        input_dim=vae_input_dim,
        embed_dim=vae_embed_dim,
        hidden_dims=tuple(vae_hidden_dims),
        codebook_size=vae_codebook_size,
        codebook_normalize=vae_codebook_normalize,
        codebook_sim_vq=vae_sim_vq,
        n_layers=vae_n_layers,
        commitment_weight=commitment_weight,
        n_cat_features=vae_n_cat_feats,
    )
    x = jnp.zeros((2, vae_input_dim))
    variables = model.init({"params": rng, "gumbel": jax.random.key(1)}, x, 0.2, False)
    variables = dict(variables)
    if pretrained_rqvae_path is not None:
        restored = restore_checkpoint(
            pretrained_rqvae_path,
            {"params": variables["params"], "step": jnp.zeros((), jnp.int32)},
        )
        variables["params"] = restored["params"]
    return SemanticIdTokenizer(
        model, variables,
        n_layers=vae_n_layers, codebook_size=vae_codebook_size,
        use_dedup_dim=use_dedup_dim,
    )


def train(
    iterations=200_000,
    batch_size=64,
    learning_rate=0.0003,
    weight_decay=0.035,
    max_grad_norm=None,  # optional global-norm clip (TPU-native extra; ref does not clip)
    dataset_folder="dataset/synthetic",
    dataset=RecDataset.SYNTHETIC,
    pretrained_rqvae_path=None,
    pretrained_decoder_path=None,
    save_dir_root="out/decoder/",
    split_batches=True,
    amp=False,
    force_dataset_process=False,
    mixed_precision_type="bf16",
    save_model_every=1_000_000,
    partial_eval_every=5_000,
    full_eval_every=10_000,
    vae_input_dim=768,
    vae_embed_dim=32,
    vae_hidden_dims=(512, 256, 128),
    vae_codebook_size=256,
    vae_codebook_normalize=False,
    vae_sim_vq=False,
    vae_n_cat_feats=18,
    vae_n_layers=3,
    decoder_embed_dim=128,
    dropout_p=0.3,
    attn_dropout=None,  # alias used by decoder_ml32m.gin
    attn_heads=8,
    attn_embed_dim=512,
    attn_layers=8,
    dataset_split="beauty",
    use_h_tokenizer=True,
    tag_alignment_weight=0.5,
    tag_prediction_weight=0.5,
    tag_class_counts=None,
    tag_embed_dim=768,
    use_dedup_dim=False,
    use_concatenated_ids=False,
    use_interleaved_ids=False,
    commitment_weight=0.25,
    model_jagged_mode=True,  # accepted for config parity; dense path on TPU
    wandb_logging=False,
    # TPU-native extras:
    seed=42,
    log_every=100,
    eval_batches=None,
    generation_temperature=1.0,
    warmup_steps=10_000,
    remat=False,
    make_plots=True,
    n_model_shards=1,  # tensor-parallel axis: shards ID table / out-proj / FF
):
    from hidvae_tpu.utils.runtime import configure_runtime

    configure_runtime()
    # Fail on impossible layout combos BEFORE data loading / TPU session
    # setup — the tokenizer would raise the same error minutes later.
    if use_h_tokenizer and use_dedup_dim and use_interleaved_ids:
        raise ValueError(
            "use_dedup_dim and use_interleaved_ids are mutually exclusive for "
            "the hierarchical tokenizer (dedup ranks are a plain-SemanticID "
            "feature; ref modules/tokenizer/h_semids.py layouts)"
        )
    if not use_h_tokenizer and use_interleaved_ids:
        # The reference's committed decoder_kuairand.gin sets
        # use_interleaved_ids=True together with use_h_tokenizer=False, but the
        # plain tokenizer has no tags to interleave; taking the flag literally
        # would map the dedup digit past the tag table and embed it as padding.
        # Deviation (PARITY.md #12): ignore interleaving on the plain route so
        # the dedup digit keeps its tag-slot embedding.
        logger.warning(
            "use_interleaved_ids=True has no effect with the plain tokenizer "
            "(no tags to interleave; ref committed decoder_kuairand.gin quirk) "
            "— ignoring it"
        )
        use_interleaved_ids = False
    if attn_dropout is not None:
        dropout_p = attn_dropout
    time_stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    save_dir = os.path.join(save_dir_root, f"decoder_{dataset.name}_{time_stamp}")
    from hidvae_tpu.train.hidvae import _setup_logging

    _setup_logging(save_dir)
    log_operative_config(logger, dict(locals()))

    rng = jax.random.key(seed)
    np_rng = np.random.RandomState(seed)

    # ---- data ----
    item_dataset = ItemData(
        root=dataset_folder, dataset=dataset, force_process=force_dataset_process,
        train_test_split="all", split=dataset_split,
    )
    train_seq = SeqData(
        root=dataset_folder, dataset=dataset, is_train=True, subsample=True,
        split=dataset_split,
    )
    eval_seq = SeqData(
        root=dataset_folder, dataset=dataset, is_train=False, subsample=False,
        split=dataset_split,
    )
    # Held-out TEST split (target items[-1], ref data/amazon.py:65-91); the
    # final-metric eval runs on it once after training.
    test_seq = SeqData(
        root=dataset_folder, dataset=dataset, subsample=False,
        split=dataset_split, seq_split="test",
    )

    # ---- tokenizer (frozen stage 1) ----
    rng, tok_rng = jax.random.split(rng)
    tokenizer = _build_tokenizer(
        use_h_tokenizer=use_h_tokenizer,
        pretrained_rqvae_path=pretrained_rqvae_path,
        vae_input_dim=vae_input_dim,
        vae_embed_dim=vae_embed_dim,
        vae_hidden_dims=vae_hidden_dims,
        vae_codebook_size=vae_codebook_size,
        vae_n_layers=vae_n_layers,
        vae_n_cat_feats=vae_n_cat_feats,
        vae_codebook_normalize=vae_codebook_normalize,
        vae_sim_vq=vae_sim_vq,
        tag_alignment_weight=tag_alignment_weight,
        tag_prediction_weight=tag_prediction_weight,
        tag_class_counts=tag_class_counts,
        tag_embed_dim=tag_embed_dim,
        use_dedup_dim=use_dedup_dim,
        use_concatenated_ids=use_concatenated_ids,
        use_interleaved_ids=use_interleaved_ids,
        commitment_weight=commitment_weight,
        rng=tok_rng,
    )
    # Adopt the checkpoint-reconciled structural values (see _build_tokenizer):
    # the audit slicing and the decoder's ID-embedding table must use the
    # tokenizer's actual geometry, not the possibly-stale gin values.
    vae_codebook_size = tokenizer.codebook_size
    vae_n_layers = tokenizer.n_layers
    corpus_ids = tokenizer.precompute_corpus_ids(item_dataset.item_features)
    sem_id_dim = tokenizer.sem_ids_dim
    logger.info(f"Corpus table: {corpus_ids.shape}, sem_ids_dim={sem_id_dim}")

    # ID repetition audit incl. semantic-only slice (ref train_transformer.py:277-328)
    # + collapse guard: if the stage-1 checkpoint recorded a healthy semantic
    # repetition rate but the rebuilt tokenizer's semantic index is degenerate,
    # the tokenizer was rebuilt wrong (structural mismatch the meta didn't
    # cover, corrupted restore, wrong item features). Training a decoder
    # against a collapsed corpus silently inflates every retrieval metric —
    # fail instead (shared with serving: common.audit_rebuilt_corpus).
    audit_rebuilt_corpus(tokenizer, corpus_ids, pretrained_rqvae_path, log=logger)

    # ---- model ----
    if pretrained_decoder_path is not None:
        # Structural self-heal, stage-2 edition (VERDICT r2 weak #4): the
        # decoder checkpoint records its full structural config; a resume gin
        # with wrong attn_heads/attn_layers would otherwise rebuild a model
        # whose param shapes match only partially — lenient restore now
        # raises past 10% mismatched leaves, but same-shape semantic drift
        # (attn_heads changes a reshape, not a kernel shape) is only caught
        # here. Checkpoint values win, loudly (same policy as the stage-1
        # reconcile in _build_tokenizer).
        rec = reconcile_vae_config(
            pretrained_decoder_path,
            {"attn_embed_dim": attn_embed_dim, "attn_heads": attn_heads,
             "attn_layers": attn_layers, "decoder_embed_dim": decoder_embed_dim},
            logger,
        )
        attn_embed_dim, attn_heads = rec["attn_embed_dim"], rec["attn_heads"]
        attn_layers, decoder_embed_dim = rec["attn_layers"], rec["decoder_embed_dim"]
        saved_d = (load_checkpoint_model_config(pretrained_decoder_path) or {}
                   ).get("sem_id_dim")
        if saved_d is not None and int(saved_d) != int(sem_id_dim):
            raise ValueError(
                f"decoder checkpoint {pretrained_decoder_path} was trained "
                f"with sem_id_dim={saved_d} but the frozen tokenizer produces "
                f"{sem_id_dim} — the stage-1 checkpoint / ID-layout flags do "
                f"not match the one this decoder was trained against."
            )
    max_seq_len = train_seq.max_seq_len
    # amp -> bf16 compute (params stay fp32); fp16 requests map to bf16 on TPU.
    compute_dtype = jnp.bfloat16 if (amp or mixed_precision_type == "bf16") else jnp.float32
    model = EncoderDecoderRetrievalModel(
        embedding_dim=decoder_embed_dim,
        attn_dim=attn_embed_dim,
        dropout=dropout_p,
        num_heads=attn_heads,
        n_layers=attn_layers,
        num_embeddings=vae_codebook_size,
        sem_id_dim=sem_id_dim,
        max_pos=max_seq_len * sem_id_dim,   # ref train_transformer.py:348
        n_sem_layers=vae_n_layers,
        use_interleaved_ids=use_interleaved_ids,
        dtype=compute_dtype,
        remat=remat,
    )

    example = tokenizer(_to_jax_seqbatch(train_seq.batch(np.arange(2), np_rng)))
    rng, init_rng = jax.random.split(rng)
    variables = model.init(
        {"params": init_rng, "dropout": jax.random.key(1)}, example, False
    )
    params = variables["params"]

    schedule = inverse_sqrt_schedule(learning_rate, warmup_steps)
    tx = make_optimizer(schedule, weight_decay, max_grad_norm=max_grad_norm)
    start_iter = 0
    opt_state = None
    if pretrained_decoder_path is not None:
        # Full-state resume: params + optimizer state + step; the inv-sqrt
        # scheduler position lives in the opt_state schedule count, matching
        # the reference's {model, optimizer, scheduler} restore
        # (ref train_transformer.py:366-375, 823-835).
        restored = restore_checkpoint(
            pretrained_decoder_path,
            {"params": params, "opt_state": tx.init(params),
             "step": jnp.zeros((), jnp.int32)},
        )
        params = restored["params"]
        opt_state = restored["opt_state"]
        start_iter = int(restored["step"])
        logger.info(f"Restored decoder from {pretrained_decoder_path} "
                    f"(iter {start_iter})")

    mesh = make_mesh(n_model=n_model_shards)
    b_shard, r_shard = batch_sharding(mesh), replicated_sharding(mesh)
    n_data = mesh.shape["data"]

    if n_model_shards > 1:
        # Tensor parallelism over 'model' (capability the reference lacks;
        # SURVEY §2.7): shard the ID table / out-proj / FF kernels, rebuild
        # opt_state on the sharded params so Adam moments inherit the layout.
        from hidvae_tpu.parallel.mesh import stage2_param_shardings

        shardings = stage2_param_shardings(mesh, params)
        params = jax.tree_util.tree_map(jax.device_put, params, shardings)
        if opt_state is None:
            opt_state = tx.init(params)
        else:
            # Resumed opt_state was restored unsharded; re-lay the Adam
            # moments out like the (now TP-sharded) params so resume keeps
            # the same HBM footprint as a fresh TP run. Scalar leaves (step
            # counts) replicate — their reference sharding is an uncommitted
            # single-device placement, not a mesh layout.
            from jax.sharding import NamedSharding

            ref = tx.init(params)
            opt_state = jax.tree_util.tree_map(
                lambda leaf, r: jax.device_put(
                    leaf,
                    r.sharding
                    if isinstance(r.sharding, NamedSharding)
                    else r_shard,
                ),
                opt_state, ref,
            )
        logger.info(f"Tensor-parallel params over {n_model_shards} shards")

    state = TrainState(
        step=jnp.asarray(start_iter, jnp.int32),
        params=params,
        batch_stats={},
        opt_state=opt_state if opt_state is not None else tx.init(params),
    )
    if n_model_shards <= 1:
        state = jax.device_put(state, r_shard)

    # Accelerate split_batches semantics (ref train_transformer.py:173-176):
    # False means batch_size is per-shard; the global batch scales with the mesh.
    if not split_batches and n_data > 1:
        batch_size = batch_size * n_data
        logger.info(f"split_batches=False: global batch = {batch_size} "
                    f"({n_data} data shards)")

    @jax.jit
    def train_step(state, batch, rng):
        def loss_fn(p):
            out = model.apply(
                {"params": p}, batch, True, rngs={"dropout": rng}
            )
            return out.loss, out.loss_d

        (loss, loss_d), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads, tx=tx)
        return new_state, {"loss": loss, "loss_d": loss_d}

    @jax.jit
    def eval_loss_step(params, batch):
        out = model.apply({"params": params}, batch, False)
        return {"loss": out.loss, "loss_d": out.loss_d}

    prefix_caps = tuple(tokenizer.prefix_caps) if tokenizer.prefix_caps else None
    # Trie-node bitmaps make the beam validity mask O(1) per query regardless
    # of prefix skew (ops.prefix_search.build_prefix_tries); jit argument, not
    # a baked constant.
    _tries_np = tokenizer.prefix_tries(model.num_embeddings)
    prefix_tries = (
        {lvl: None if t is None else (jnp.asarray(t[0]), jnp.asarray(t[1]))
         for lvl, t in _tries_np.items()}
        if _tries_np else None
    )
    generate = jax.jit(
        lambda params, batch, index, tries: model.apply(
            {"params": params}, batch, index,
            temperature=generation_temperature,
            prefix_caps=prefix_caps, prefix_tries=tries,
            method=EncoderDecoderRetrievalModel.generate_next_sem_id,
        )
    )

    def to_device(batch):
        def put(x):
            if x is None:
                return None
            a = jnp.asarray(x)
            return jax.device_put(
                a, b_shard if a.shape[0] % n_data == 0 else r_shard
            )

        return jax.tree_util.tree_map(put, batch)

    history = {"iterations": [], "train_loss": [], "eval_iterations": [],
               "eval_loss": [], "full_eval_iterations": [], "full_eval_metrics": [],
               "test_eval_metrics": None}
    saved = []
    t_start = time.time()

    # Device-resident pipeline: histories + corpus table live in HBM; each
    # step samples rows, random-crops windows, and tokenizes by gather inside
    # a scan-chunked jitted program (hidvae_tpu.train.device_data).
    from hidvae_tpu.train.device_data import (
        DeviceSeqData,
        random_crop_windows,
        tokenize_on_device,
    )

    dseq = DeviceSeqData(
        user_ids=jnp.asarray(train_seq.users, jnp.int32),
        items=jnp.asarray(train_seq.items, jnp.int32),
        fut=jnp.asarray(train_seq.fut, jnp.int32),
    )
    cached_table = jnp.asarray(tokenizer.cached_ids, jnp.int32)
    # Evals/saves fire at chunk boundaries, so the chunk must not be coarser
    # than any host-side cadence (see train/hidvae.py).
    chunk = max(1, min(log_every, partial_eval_every, full_eval_every,
                       save_model_every, iterations))

    # Per-step randomness is a pure function of (seed, global step) so a
    # resumed run replays the identical sample/crop/dropout stream — required
    # for resume equivalence (train 2N == train N; save; restore; train N).
    step_root = jax.random.fold_in(jax.random.key(seed), 0x5EED)

    def shard_dp(t):
        """Pin sampled batches to the data axis so the DP split is explicit
        (XLA then partitions the tokenize gathers and inserts the gradient
        all-reduce; ref semantics: Accelerate DDP, SURVEY §2.7)."""
        if t is None or n_data <= 1 or t.shape[0] % n_data != 0:
            return t
        return jax.lax.with_sharding_constraint(t, b_shard)

    # `data`/`table` are jit ARGUMENTS, not closure captures: closed-over
    # device arrays are baked into the lowered program as constants (multi-GB
    # at 200k-item scale — slow remote compiles, duplicated HBM), while
    # arguments are passed by reference at dispatch time.
    @partial(jax.jit, donate_argnums=(0,))
    def train_chunk(state, data, table, it0):
        def body(carry, i):
            r_sample, r_crop, r_step = jax.random.split(
                jax.random.fold_in(step_root, it0 + i), 3
            )
            u, items, fut = data.sample_rows(r_sample, batch_size)
            if train_seq.subsample:
                items, fut = random_crop_windows(r_crop, items, fut)
            tokenized = tokenize_on_device(table, u, items, fut)
            tokenized = jax.tree_util.tree_map(shard_dp, tokenized)
            new_state, m = train_step(carry, tokenized, r_step)
            return new_state, m

        return jax.lax.scan(body, state, jnp.arange(chunk))

    # Sliding-window(1000) loss means (ref train_transformer.py logging style,
    # train_rqvae.py:226-232).
    from collections import deque

    loss_window = deque(maxlen=1000)

    it = start_iter
    while it < start_iter + iterations:
        n_now = min(chunk, start_iter + iterations - it)
        if n_now == chunk:
            state, mstack = train_chunk(
                state, dseq, cached_table, jnp.asarray(it, jnp.int32)
            )
            loss = float(np.asarray(mstack["loss"])[-1])
            loss_d = np.asarray(mstack["loss_d"])[-1]
            loss_window.extend(np.asarray(mstack["loss"]).reshape(-1).tolist())
        else:  # ragged tail: fall back to per-step host calls
            for j in range(n_now):
                r_s, r_c, r_t = jax.random.split(jax.random.fold_in(step_root, it + j), 3)
                u, items_, fut_ = dseq.sample_rows(r_s, batch_size)
                if train_seq.subsample:
                    items_, fut_ = random_crop_windows(r_c, items_, fut_)
                tokenized = jax.tree_util.tree_map(
                    shard_dp, tokenize_on_device(cached_table, u, items_, fut_)
                )
                state, m = train_step(state, tokenized, r_t)
            loss = float(np.asarray(m["loss"]))
            loss_d = np.asarray(m["loss_d"])
            loss_window.append(loss)
        prev_it, it = it, it + n_now

        history["iterations"].append(it - 1)
        history["train_loss"].append(loss)
        logger.info(
            f"iter {it - 1}: loss={loss:.4f} "
            f"(window mean {float(np.mean(loss_window)):.4f}) "
            f"loss_d={loss_d.round(3).tolist()} "
            f"({(it - start_iter) * batch_size / (time.time() - t_start):.0f} seqs/s)"
        )

        def crossed(every):
            return (prev_it // every) != (it // every) or it == start_iter + iterations

        if crossed(partial_eval_every):
            from hidvae_tpu.utils.debug import compute_debug_metrics

            sums, n = 0.0, 0
            dbg = {}
            for bi, eb in enumerate(eval_seq.iter_eval_batches(batch_size)):
                if eval_batches is not None and bi >= eval_batches:
                    break
                tok = tokenizer(_to_jax_seqbatch(eb))
                em = eval_loss_step(state.params, to_device(tok))
                sums += float(np.asarray(em["loss"])) * len(eb.user_ids)
                n += len(eb.user_ids)
                if bi == 0:  # seq-length quantiles + per-digit losses (ref
                    # modules/utils.py:65-78, logged at eval in the reference)
                    class _O:  # minimal shim carrying loss_d
                        loss_d = em["loss_d"]

                    dbg = compute_debug_metrics(tok, _O, prefix="eval")
            history["eval_iterations"].append(it)
            history["eval_loss"].append(sums / max(n, 1))
            logger.info(f"partial eval @ {it}: loss={sums / max(n, 1):.4f} "
                        + " ".join(f"{k}={v:.3g}" for k, v in dbg.items()))

        if crossed(full_eval_every):
            metrics = full_eval(
                generate, state.params, tokenizer, eval_seq, batch_size,
                eval_batches=eval_batches, prefix_tries=prefix_tries,
            )
            history["full_eval_iterations"].append(it)
            history["full_eval_metrics"].append(metrics)
            logger.info(f"full eval @ {it}: " + ", ".join(
                f"{k}={v:.4f}" for k, v in sorted(metrics.items())
                if "slice" in k or "pos" in k
            ))

        if crossed(save_model_every):
            payload = {
                "step": state.step,
                "params": state.params,
                "opt_state": state.opt_state,
                # Full structural config (not just attn_dim/sem_id_dim): the
                # serving engine and decoder resume reconcile against this,
                # exactly like stage-1 checkpoints (VERDICT r2 weak #4).
                "model_config": {
                    "attn_dim": attn_embed_dim,  # legacy key, kept for old readers
                    "attn_embed_dim": attn_embed_dim,
                    "attn_heads": attn_heads,
                    "attn_layers": attn_layers,
                    "decoder_embed_dim": decoder_embed_dim,
                    "sem_id_dim": sem_id_dim,
                    "num_embeddings": int(vae_codebook_size),
                    "n_sem_layers": int(vae_n_layers),
                    "use_interleaved_ids": bool(use_interleaved_ids),
                    "max_pos": int(max_seq_len * sem_id_dim),
                },
                "metrics": {},
            }
            saved.append(save_checkpoint(save_dir, f"checkpoint_{it}", payload))

    # Final-metric eval on the held-out TEST split (target items[-1]),
    # which the reference prepares but never reports on (data/amazon.py:65-91).
    if len(test_seq) > 0:
        test_metrics = full_eval(
            generate, state.params, tokenizer, test_seq, batch_size,
            eval_batches=eval_batches, prefix_tries=prefix_tries,
        )
        history["test_eval_metrics"] = test_metrics
        logger.info("TEST eval (items[-1] targets): " + ", ".join(
            f"{k}={v:.4f}" for k, v in sorted(test_metrics.items())
            if "slice" in k or "pos" in k
        ))

    if make_plots:
        try:
            from hidvae_tpu.train.plots import plot_transformer_history

            plot_transformer_history(history, os.path.join(save_dir, "plots"))
        except Exception as e:
            logger.warning(f"Plotting failed: {e}")

    return {
        "state": state,
        "model": model,
        "tokenizer": tokenizer,
        "save_dir": save_dir,
        "history": history,
        "saved_paths": saved,
    }


def _to_jax_seqbatch(batch: SeqBatch) -> SeqBatch:
    return jax.tree_util.tree_map(jnp.asarray, batch)


def _pad_rows(batch: SeqBatch, n: int) -> SeqBatch:
    """Pad a batch to n rows by repeating row 0 — keeps every eval sweep at
    one static shape so jitted `generate` never recompiles for the ragged
    final batch (VERDICT weak #7); callers slice metrics back to valid rows."""
    def pad(a):
        a = np.asarray(a)
        idx = np.concatenate(
            [np.arange(len(a)), np.zeros(n - len(a), np.int64)]
        )
        return a[idx]

    return jax.tree_util.tree_map(pad, batch)


def full_eval(generate, params, tokenizer, eval_seq, batch_size,
              eval_batches=None, prefix_tries=None):
    """Constrained-generation eval: beam search -> TopK/NDCG per digit/prefix
    (ref train_transformer.py:467-617, 802-819)."""
    topk = TopKAccumulator(ks=[1, 5, 10])
    ndcg = NDCGAccumulator(ks=[1, 5, 10])
    index = tokenizer.prefix_index if hasattr(tokenizer, "prefix_index") else None
    if index is None:
        index = tokenizer._prefix_index
    for bi, eb in enumerate(eval_seq.iter_eval_batches(batch_size)):
        if eval_batches is not None and bi >= eval_batches:
            break
        n_valid = len(np.asarray(eb.user_ids))
        if n_valid < batch_size:
            eb = _pad_rows(eb, batch_size)
        tok = tokenizer(_to_jax_seqbatch(eb))
        gen = generate(params, tok, index, prefix_tries)
        actual = np.asarray(tok.sem_ids_fut)[:n_valid]
        top_k_ids = np.asarray(gen.sem_ids)[:n_valid]
        topk.accumulate(actual, top_k_ids)
        ndcg.accumulate(actual, top_k_ids)
        if bi == 0:
            # Sample prediction printouts (ref train_transformer.py:619-795).
            for s in range(min(3, len(actual))):
                logger.info(
                    f"eval sample {s}: actual={actual[s].tolist()} "
                    f"top3={[row.tolist() for row in top_k_ids[s, :3]]} "
                    f"hit@10={bool((top_k_ids[s, :10] == actual[s]).all(-1).any())}"
                )
    return {**topk.reduce(), **ndcg.reduce()}
