"""Attribute the stage-2 train-step and beam-generation MFU (VERDICT r3
weak #1 / next #3): where do the non-MXU fractions go, and what is the
roofline ceiling at these shapes?

Method — three independent views that must agree:
  1. Component ablation: time (a) forward loss only, (b) forward+backward,
     (c) the full step incl. AdamW, each inside one jitted scan (same
     dispatch amortization as the real trainer). Differences attribute wall
     time to backward and optimizer.
  2. XLA compiled cost analysis per program: FLOPs and bytes accessed give
     each program's arithmetic intensity; the roofline ceiling is
     min(peak_flops, intensity * HBM_BW). v5e: 197 TFLOP/s bf16,
     ~819 GB/s HBM.
  3. A jax.profiler trace of one steady-state window (out/profile_*), for
     offline inspection.

Shapes are bench.py's Amazon stage-2 flagship (B=256, 20 items x 6 digits =
121 ctx tokens, 8x512 bf16) and the 64-user x 32-beam x 6-digit beam step.

Usage:  python scripts/profile_attrib.py            (real TPU; ONE process)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197e12   # v5e bf16
HBM_BW = 819e9         # v5e HBM bytes/s


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def cost(jitted, args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {
            "flops": float(ca.get("flops", float("nan"))),
            "bytes": float(ca.get("bytes accessed", float("nan"))),
        }
    except Exception as e:  # noqa: BLE001
        log(f"cost_analysis unavailable: {e}")
        return {"flops": float("nan"), "bytes": float("nan")}


def timed_scan(fn, args, iters=50):
    """Wall time per iteration of fn inside one jitted scan (fn must be a
    (carry, i) -> carry step already embedded by the caller)."""
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    from hidvae_tpu.utils.runtime import configure_runtime

    configure_runtime()
    import optax

    from hidvae_tpu.data.schemas import TokenizedSeqBatch
    from hidvae_tpu.models.retrieval import EncoderDecoderRetrievalModel
    from hidvae_tpu.train.common import TrainState

    # Absorb the one-time first-readback settle (CLAUDE.md).
    x = jax.jit(lambda: jnp.arange(8, dtype=jnp.int32))()
    t0 = time.perf_counter()
    np.asarray(x)
    log(f"first readback settle: {time.perf_counter() - t0:.1f}s")

    smoke = os.environ.get("HIDVAE_PROFILE_SMOKE") == "1"
    B, N, D, K = (8, 5, 6, 32) if smoke else (256, 20, 6, 256)
    T = N * D
    model = EncoderDecoderRetrievalModel(
        embedding_dim=128, attn_dim=512, dropout=0.3, num_heads=8,
        n_layers=2 if smoke else 8,
        num_embeddings=K, sem_id_dim=D, max_pos=T, n_sem_layers=3,
        dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    batch = TokenizedSeqBatch(
        user_ids=jnp.asarray(rng.randint(0, 2000, (B,)), jnp.int32),
        sem_ids=jnp.asarray(rng.randint(0, K, (B, T)), jnp.int32),
        sem_ids_fut=jnp.asarray(rng.randint(0, K, (B, D)), jnp.int32),
        seq_mask=jnp.ones((B, T), bool),
        token_type_ids=jnp.tile(jnp.arange(D, dtype=jnp.int32), (B, N)),
        token_type_ids_fut=jnp.tile(jnp.arange(D, dtype=jnp.int32), (B, 1)),
    )
    tx = optax.adamw(3e-4, weight_decay=0.035)

    @jax.jit
    def init_state(r):
        v = model.init({"params": r, "dropout": jax.random.key(1)}, batch, False)
        return TrainState(step=jnp.zeros((), jnp.int32), params=v["params"],
                          batch_stats={}, opt_state=tx.init(v["params"]))

    state = init_state(jax.random.key(0))
    iters = 3 if smoke else 50

    def scan_of(body):
        @jax.jit
        def run(state, r):
            def step(carry, i):
                return body(carry, jax.random.fold_in(r, i)), ()
            out, _ = jax.lax.scan(step, state, jnp.arange(iters))
            return out
        return run

    # (a) forward only: loss value (params untouched; thread loss as carry
    # fodder so the scan can't DCE the body).
    @jax.jit
    def fwd_many(params, r):
        def step(acc, i):
            loss = model.apply({"params": params}, batch, True,
                               rngs={"dropout": jax.random.fold_in(r, i)}).loss
            return acc + loss, ()
        out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(iters))
        return out

    # (b) forward + backward, no optimizer: carry a grads-sum.
    @jax.jit
    def fwdbwd_many(params, r):
        def step(acc, i):
            g = jax.grad(lambda p: model.apply(
                {"params": p}, batch, True,
                rngs={"dropout": jax.random.fold_in(r, i)}).loss)(params)
            flat = jax.tree_util.tree_leaves(g)
            return acc + sum(jnp.sum(l.astype(jnp.float32)) for l in flat), ()
        out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(iters))
        return out

    # (c) full step (fwd+bwd+AdamW), the real trainer body.
    def full_body(carry, r):
        loss, grads = jax.value_and_grad(lambda p: model.apply(
            {"params": p}, batch, True, rngs={"dropout": r}).loss)(carry.params)
        return carry.apply_gradients(grads=grads, tx=tx)

    full_many = scan_of(full_body)

    t_fwd = timed_scan(fwd_many, (state.params, jax.random.key(2)), iters)
    t_fwdbwd = timed_scan(fwdbwd_many, (state.params, jax.random.key(2)), iters)
    t_full = timed_scan(full_many, (state, jax.random.key(2)), iters)

    # One-step straight-line programs for cost analysis (scan bodies are
    # analyzed once regardless of trip count, so FLOPs would be iters-fold
    # understated through the scans above).
    @jax.jit
    def fwd_one(params, r):
        return model.apply({"params": params}, batch, True,
                           rngs={"dropout": r}).loss

    @jax.jit
    def fwdbwd_one(params, r):
        return jax.grad(lambda p: model.apply(
            {"params": p}, batch, True, rngs={"dropout": r}).loss)(params)

    @jax.jit
    def full_one(state, r):
        return full_body(state, r)

    ca_fwd = cost(fwd_one, (state.params, jax.random.key(2)))
    ca_fwdbwd = cost(fwdbwd_one, (state.params, jax.random.key(2)))
    ca_full = cost(full_one, (state, jax.random.key(2)))

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))

    report = {"shape": f"B={B} T={T} 8x512 bf16", "n_params": int(n_params)}
    for name, t, ca in (("fwd", t_fwd, ca_fwd),
                        ("fwd+bwd", t_fwdbwd, ca_fwdbwd),
                        ("full_step", t_full, ca_full)):
        tf = ca["flops"] / 1e12
        intensity = ca["flops"] / ca["bytes"] if ca["bytes"] else float("nan")
        roof = min(PEAK_TFLOPS, intensity * HBM_BW)
        report[name] = {
            "ms": round(t * 1e3, 2),
            "tflop": round(tf, 4),
            "achieved_tflops": round(ca["flops"] / t / 1e12, 1),
            "mfu": round(ca["flops"] / t / PEAK_TFLOPS, 4),
            "bytes_gb": round(ca["bytes"] / 1e9, 3),
            "arith_intensity": round(intensity, 1),
            "roofline_tflops": round(roof / 1e12, 1),
            "pct_of_roofline": round(ca["flops"] / t / roof, 4),
        }
        log(f"{name}: {report[name]}")
    report["attribution_ms"] = {
        "forward": round(t_fwd * 1e3, 2),
        "backward": round((t_fwdbwd - t_fwd) * 1e3, 2),
        "optimizer": round((t_full - t_fwdbwd) * 1e3, 2),
    }
    log(f"attribution: {report['attribution_ms']}")

    # ---- beam generation at growing batch (amortization curve) ----
    from hidvae_tpu.ops.prefix_search import build_prefix_index, build_prefix_tries

    corpus_np = np.random.RandomState(1).randint(0, K, (500 if smoke else 12000, D))
    corpus = build_prefix_index(jnp.asarray(corpus_np, jnp.int32))
    sorted_np = np.asarray(corpus)
    tries = {
        lvl: None if t is None else (jnp.asarray(t[0]), jnp.asarray(t[1]))
        for lvl, t in build_prefix_tries(sorted_np, K).items()
    }
    caps = []
    for length in range(1, D):
        _, c = np.unique(sorted_np[:, :length], axis=0, return_counts=True)
        caps.append(int(c.max()))

    beam = {}
    for gb_size in (8,) if smoke else (64, 256, 512):
        gb = jax.tree_util.tree_map(
            lambda x: jnp.concatenate([x] * ((gb_size + B - 1) // B))[:gb_size],
            batch,
        )
        g_iters = 10

        @jax.jit
        def gen_many(p, b):
            def body(acc, i):
                bi = b.replace(sem_ids=jnp.roll(b.sem_ids, i, axis=0))
                o = model.apply(
                    {"params": p}, bi, corpus, prefix_caps=tuple(caps),
                    prefix_tries=tries,
                    method=EncoderDecoderRetrievalModel.generate_next_sem_id,
                )
                return acc + o.sem_ids.sum(), ()
            out, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                  jnp.arange(g_iters))
            return out

        @jax.jit
        def gen_one(p, b):
            return model.apply(
                {"params": p}, b, corpus, prefix_caps=tuple(caps),
                prefix_tries=tries,
                method=EncoderDecoderRetrievalModel.generate_next_sem_id,
            ).sem_ids

        dt = timed_scan(gen_many, (state.params, gb), g_iters)
        ca = cost(gen_one, (state.params, gb))
        intensity = ca["flops"] / ca["bytes"] if ca["bytes"] else float("nan")
        roof = min(PEAK_TFLOPS, intensity * HBM_BW)
        beam[gb_size] = {
            "ms": round(dt * 1e3, 1),
            "users_per_sec": round(gb_size / dt, 1),
            "tflop": round(ca["flops"] / 1e12, 4),
            "mfu": round(ca["flops"] / dt / PEAK_TFLOPS, 4),
            "bytes_gb": round(ca["bytes"] / 1e9, 3),
            "arith_intensity": round(intensity, 1),
            "roofline_tflops": round(roof / 1e12, 1),
            "pct_of_roofline": round(ca["flops"] / dt / roof, 4),
        }
        log(f"beam B={gb_size}: {beam[gb_size]}")
    report["beam"] = beam

    # ---- profiler trace of one steady-state window ----
    trace_dir = "out/profile_stage2"
    try:
        with jax.profiler.trace(trace_dir):
            jax.block_until_ready(full_many(state, jax.random.key(5)))
        report["trace_dir"] = trace_dir
        log(f"profiler trace written to {trace_dir}")
    except Exception as e:  # noqa: BLE001
        log(f"profiler trace unavailable: {e}")

    print(json.dumps(report))


if __name__ == "__main__":
    main()
