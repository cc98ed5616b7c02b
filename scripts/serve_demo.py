"""Serve recommendations from trained two-stage checkpoints.

The reference repo has no inference entry point at all — retrieval quality can
only be observed inside train_transformer.py's eval loop
(/root/reference/train_transformer.py:467-502). This script is the deployment
surface: it reconstructs the frozen tokenizer + decoder from a decoder gin
config plus the two checkpoint paths, builds a `RetrievalEngine`, and serves
top-K recommendations for real (or sampled) user histories.

Usage:
    python scripts/serve_demo.py configs/decoder_synthetic_large.gin \
        --stage1 out/hrqvae/.../hrqvae_ACC..._DUPR... \
        --stage2 out/decoder/.../checkpoint_50000 \
        [--users 8] [--top-k 10]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("gin_path", help="decoder gin config (model/tokenizer shapes)")
    ap.add_argument("--stage1", required=True, help="stage-1 (tokenizer) checkpoint dir")
    ap.add_argument("--stage2", required=True, help="stage-2 (decoder) checkpoint dir")
    ap.add_argument("--users", type=int, default=8, help="number of eval users to serve")
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument(
        "--sweep", default=None,
        help="comma-separated request sizes; measures a latency/throughput "
             "row per size (e.g. --sweep 8,32,64,128)",
    )
    args = ap.parse_args()

    from hidvae_tpu.utils.runtime import configure_runtime

    configure_runtime()

    import numpy as np

    from hidvae_tpu.data.processed import SeqData
    from hidvae_tpu.serve import RetrievalEngine
    from hidvae_tpu.utils.ginlite import parse_gin_file

    cfg = parse_gin_file(args.gin_path)["train"]
    test_seq = SeqData(
        root=cfg["dataset_folder"], dataset=cfg["dataset"], subsample=False,
        split=cfg.get("dataset_split", ""), seq_split="test",
    )

    print("Building corpus index + restoring models ...", file=sys.stderr)
    t0 = time.perf_counter()
    engine = RetrievalEngine.from_artifacts(
        args.gin_path, args.stage1, args.stage2, batch_buckets=(args.users,),
    )
    print(f"engine ready in {time.perf_counter() - t0:.1f}s "
          f"(corpus {engine.n_items} x {engine.sem_id_dim})", file=sys.stderr)

    # Serve the first N test users' histories; the test target (items[-1])
    # tells us whether the recommendation actually hit.
    rng = np.random.RandomState(0)
    batch = test_seq.batch(np.arange(args.users), rng)
    hist = np.asarray(batch.ids)
    targets = np.asarray(batch.ids_fut)[:, 0]
    out = engine.recommend(hist, user_ids=np.asarray(batch.user_ids),
                           top_k=args.top_k)
    print(f"first request (incl. compile): {out['latency_s']:.1f}s",
          file=sys.stderr)
    # Steady state: several repeats; report the median request latency.
    lats = []
    for _ in range(5):
        out = engine.recommend(hist, user_ids=np.asarray(batch.user_ids),
                               top_k=args.top_k)
        lats.append(out["latency_s"])
    lat = float(np.median(lats))
    print(f"steady-state: {lat * 1e3:.0f} ms / {args.users} users "
          f"({args.users / lat:.0f} users/s; "
          f"best {min(lats) * 1e3:.0f} ms over {len(lats)} requests)",
          file=sys.stderr)

    hits = 0
    for u in range(args.users):
        rec = out["items"][u]
        hit = targets[u] in rec
        hits += hit
        print(f"user {int(batch.user_ids[u])}: history {hist[u][hist[u] >= 0][-5:].tolist()} "
              f"-> top-{args.top_k} {rec.tolist()} "
              f"(target {targets[u]}, {'HIT' if hit else 'miss'})")
    print(f"hit@{args.top_k}: {hits}/{args.users}")

    if args.sweep:
        sizes = [int(s) for s in args.sweep.split(",")]
        print("\nbucket sweep (steady-state, median of 5):", file=sys.stderr)
        for b in sizes:
            if b not in engine.batch_buckets:
                engine.batch_buckets = tuple(sorted({*engine.batch_buckets, b}))
            sb = test_seq.batch(np.arange(b) % len(test_seq), rng)
            h = np.asarray(sb.ids)
            engine.recommend(h, top_k=args.top_k)  # compile
            lats = [engine.recommend(h, top_k=args.top_k)["latency_s"]
                    for _ in range(5)]
            lat = float(np.median(lats))
            print(f"  {b:4d} users: {lat * 1e3:7.1f} ms  "
                  f"({b / lat:7.0f} users/s)", file=sys.stderr)


if __name__ == "__main__":
    main()
