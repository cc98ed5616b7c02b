"""Large-corpus index-build + serving microbench (no training).

The reference's pipeline was never exercised past Amazon Beauty scale
(~12k items, /root/reference/data/amazon.py); its corpus index is rebuilt with
a Python DataLoader sweep (ref modules/tokenizer/h_semids.py:109-195) and its
`exists_prefix` verifier is an O(Q*N*D) all-pairs equality scan chunked by 16
(ref :197-239) — at 10^6 items a single 200-candidate beam step would scan
1.2*10^9 row-comparisons per query batch. This bench sizes the TPU-native
design (jitted corpus sweep; sorted prefix table + binary-search ranges) at
production catalog scales: 200k and 1M items.

Stage-1 quality is irrelevant here (shape-dependent perf only): a k-means-
initialized, untrained quantizer over random unit features gives realistic
ID dispersion. Results print to stdout as JSON lines; run on the real chip.

Usage: python scripts/bench_scale.py [n_items ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_one(n_items: int, request_users: int = 64, max_seq_len: int = 20):
    from hidvae_tpu.models.quantize import QuantizeForwardMode
    from hidvae_tpu.models.retrieval import EncoderDecoderRetrievalModel
    from hidvae_tpu.models.rqvae import RqVae
    from hidvae_tpu.serve import RetrievalEngine
    from hidvae_tpu.tokenizer import SemanticIdTokenizer
    from hidvae_tpu.train.init import kmeans_init_codebooks

    F, D, K, L = 768, 32, 256, 3
    print(f"--- n_items={n_items} ---", file=sys.stderr, flush=True)

    rng = np.random.RandomState(0)
    feats = rng.randn(n_items, F).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)

    vae = RqVae(
        input_dim=F, embed_dim=D, hidden_dims=(512, 256, 128),
        codebook_size=K, n_layers=L, n_cat_features=0,
        codebook_normalize=True, codebook_mode=QuantizeForwardMode.ROTATION_TRICK,
    )
    x0 = jnp.asarray(feats[: min(n_items, 20_000)])

    @jax.jit
    def init_vars(rng_key, x):
        return vae.init({"params": rng_key, "gumbel": jax.random.key(1)},
                        x[:4], 0.2, train=False)

    variables = init_vars(jax.random.key(0), x0)
    variables = kmeans_init_codebooks(vae, variables, x0, jax.random.key(2))
    tok = SemanticIdTokenizer(vae, variables, n_layers=L, codebook_size=K)

    # --- index build: full-corpus sweep through the frozen quantizer ---
    t0 = time.perf_counter()
    ids = tok.precompute_corpus_ids(feats)
    jax.block_until_ready(ids)
    t_sweep = time.perf_counter() - t0
    print(f"corpus sweep: {t_sweep:.2f}s ({n_items / t_sweep / 1e6:.2f}M items/s)",
          file=sys.stderr, flush=True)

    # --- serving engine (re-sweeps + sorts the prefix index) ---
    model = EncoderDecoderRetrievalModel(
        embedding_dim=128, attn_dim=512, dropout=0.3, num_heads=8, n_layers=8,
        num_embeddings=K, sem_id_dim=L, max_pos=max_seq_len * L, n_sem_layers=L,
    )
    from hidvae_tpu.data.schemas import TokenizedSeqBatch

    t = max_seq_len * L
    example = TokenizedSeqBatch(
        user_ids=jnp.zeros((2,), jnp.int32),
        sem_ids=jnp.zeros((2, t), jnp.int32),
        sem_ids_fut=jnp.zeros((2, L), jnp.int32),
        seq_mask=jnp.ones((2, t), bool),
        token_type_ids=jnp.tile(jnp.arange(L, dtype=jnp.int32), (2, max_seq_len)),
        token_type_ids_fut=jnp.tile(jnp.arange(L, dtype=jnp.int32), (2, 1)),
    )
    params = jax.jit(
        lambda r: model.init({"params": r, "dropout": jax.random.key(4)},
                             example, False)
    )(jax.random.key(3))["params"]

    t0 = time.perf_counter()
    engine = RetrievalEngine(
        model, params, tok, feats,
        max_seq_len=max_seq_len, batch_buckets=(request_users,),
    )
    jax.block_until_ready(engine.sorted_ids)
    t_engine = time.perf_counter() - t0

    div_rep = 1.0 - len(np.unique(np.asarray(ids), axis=0)) / n_items

    engine.warmup()

    def median_latency(n_reps=7):
        lat, res = [], None
        for _ in range(n_reps):
            out = engine.recommend(
                rng.randint(0, n_items, (request_users, max_seq_len)), top_k=10
            )
            lat.append(out["latency_s"])
            res = float((out["items"] >= 0).mean())
        return sorted(lat)[len(lat) // 2] * 1e3, res

    lat_ms, resolved = median_latency()
    ups = request_users / (lat_ms / 1e3)

    # VERDICT r2 weak #6 measurement. Default path: trie-node bitmaps (O(1)
    # per beam). Probe A re-jits with tries disabled — the [B*k, cap] range
    # gather whose cost scales with the worst prefix skew. Probe B clamps the
    # caps tiny (correctness-breaking, perf floor only) to isolate the
    # gather's cost from the rest of the beam step.
    caps = list(engine.prefix_caps or [])
    tries = engine.prefix_tries
    engine.prefix_tries = None
    engine._serve_fns = {}
    engine.warmup()
    lat_caps_ms, _ = median_latency()
    engine.prefix_caps = tuple(min(c, 8) for c in caps)
    engine._serve_fns = {}
    engine.warmup()
    lat_clamped_ms, _ = median_latency()
    engine.prefix_caps = tuple(caps)
    engine.prefix_tries = tries
    engine._serve_fns = {}

    # Large-request path (VERDICT r2 weak #7): 1k users in one call exercises
    # the vectorized host-side padding + bucket chunking.
    big = 1024
    engine.warmup()  # the probes above reset the compiled serve fns
    t0 = time.perf_counter()
    t_host0 = time.process_time()
    out_big = engine.recommend(
        rng.randint(0, n_items, (big, max_seq_len)), top_k=10
    )
    big_wall = time.perf_counter() - t0
    big_host_cpu = time.process_time() - t_host0
    big_ups = big / big_wall
    print(
        f"1k-user request: {big_wall * 1e3:.0f} ms wall ({big_ups:.0f} users/s), "
        f"host CPU {big_host_cpu * 1e3:.0f} ms, "
        f"resolved {float((out_big['items'] >= 0).mean()):.3f}",
        file=sys.stderr, flush=True,
    )

    # --- serving batch knee (VERDICT r3 next #4): users/s and beam-gen MFU
    # for a fixed 1024-user request as the batch bucket grows. Round 3 found
    # 64-user and 1k-user requests at identical users/s because both chunk
    # sequentially through one small bucket; this measures where (whether)
    # batch amortization saturates.
    knee = []
    knee_buckets = [
        int(b) for b in os.environ.get(
            "HIDVAE_KNEE_BUCKETS", "128,256,512,1024").split(",")
    ]
    big_req = rng.randint(0, n_items, (1024, max_seq_len))
    for bucket in knee_buckets:
        engine.batch_buckets = (bucket,)
        engine._serve_fns = {}
        engine.warmup()
        lats = []
        for _ in range(3):
            out_k = engine.recommend(big_req, top_k=10)
            lats.append(out_k["latency_s"])
        wall = sorted(lats)[1]
        row = {"bucket": bucket, "users_per_sec": round(1024 / wall, 1),
               "ms_per_1024_users": round(wall * 1e3, 1)}
        try:
            fn = engine._serve_fn(bucket)
            args = (
                engine.params, engine.tokenizer.cached_ids, engine.sorted_ids,
                engine.perm, engine.prefix_tries,
                jnp.zeros((bucket,), jnp.int32),
                jnp.zeros((bucket, max_seq_len), jnp.int32),
            )
            fl = float(fn.lower(*args).compile().cost_analysis()["flops"])
            row["tflop_per_batch"] = round(fl / 1e12, 4)
            row["beam_mfu"] = round(fl * (1024 / bucket) / wall / 197e12, 4)
        except Exception as e:  # cost analysis is best-effort
            print(f"cost_analysis unavailable at bucket {bucket}: {e}",
                  file=sys.stderr, flush=True)
        knee.append(row)
        print(f"knee bucket {bucket}: {row}", file=sys.stderr, flush=True)
    engine.batch_buckets = (request_users,)
    engine._serve_fns = {}

    print(
        f"serve: {lat_ms:.0f} ms / {request_users}-user request "
        f"({ups:.0f} users/s, trie masks), top-10 resolved {resolved:.3f}, "
        f"engine build {t_engine:.2f}s, corpus repetition {div_rep:.3f}, "
        f"prefix caps {caps}; cap-gather path {lat_caps_ms:.0f} ms, "
        f"clamped-cap floor {lat_clamped_ms:.0f} ms",
        file=sys.stderr, flush=True,
    )
    return {
        "n_items": n_items,
        "corpus_sweep_s": round(t_sweep, 3),
        "corpus_sweep_items_per_sec": round(n_items / t_sweep, 1),
        "engine_build_s": round(t_engine, 2),
        "serve_ms_per_64u_request": round(lat_ms, 1),
        "serve_users_per_sec": round(ups, 1),
        "top10_resolved_frac": round(resolved, 4),
        "corpus_repetition": round(div_rep, 4),
        "prefix_caps": caps,
        "serve_ms_cap_gather_path": round(lat_caps_ms, 1),
        "serve_ms_clamped_cap_floor": round(lat_clamped_ms, 1),
        "mask_gather_ms": round(lat_caps_ms - lat_clamped_ms, 1),
        "trie_speedup_vs_cap_gather": round(lat_caps_ms / max(lat_ms, 1e-9), 3),
        "serve_1k_users_ms": round(big_wall * 1e3, 1),
        "serve_1k_users_per_sec": round(big_ups, 1),
        "serve_1k_host_cpu_ms": round(big_host_cpu * 1e3, 1),
        "bucket_knee": knee,
    }


def main():
    from hidvae_tpu.utils.runtime import configure_runtime

    configure_runtime()
    # Absorb the remote tunnel's one-time first-readback stall (200-650 s
    # regardless of size, CLAUDE.md) so sweep/engine timings measure the
    # framework, not session settling.
    x = jax.jit(lambda: jnp.arange(8, dtype=jnp.int32))()
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    np.asarray(x)
    settle = time.perf_counter() - t0
    print(f"first device->host readback (session settling): {settle:.2f}s",
          file=sys.stderr, flush=True)
    sizes = [int(s) for s in sys.argv[1:]] or [200_000, 1_000_000]
    results = [bench_one(n) for n in sizes]
    print(json.dumps({"scale_bench": results,
                      "first_readback_settle_s": round(settle, 2)}))


if __name__ == "__main__":
    main()
