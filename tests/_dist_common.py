"""Shared step definition for the multi-process distributed test: one
deterministic stage-1 (HiD-VAE) DP train step over whatever device list the
caller provides. Both the 2-process workers and the in-test single-process
reference call this, so any divergence is a real multi-host semantics bug."""

import numpy as np

BATCH = 8
FDIM = 32


def _model_and_batch():
    import jax
    import jax.numpy as jnp

    from hidvae_tpu.models.hrqvae import HRqVae

    model = HRqVae(
        input_dim=FDIM, embed_dim=8, hidden_dims=(16,), codebook_size=16,
        n_layers=3, n_cat_features=0, tag_class_counts=(4, 6, 8),
        tag_embed_dim=16,
    )
    # Host-side deterministic data: identical on every process.
    rng = np.random.RandomState(0)
    x = rng.randn(BATCH, FDIM).astype(np.float32)
    te = rng.randn(BATCH, 3, 16).astype(np.float32)
    ti = rng.randint(0, 4, (BATCH, 3)).astype(np.int32)
    return model, x, te, ti


def run_one_step(devices) -> float:
    """One jitted DP train step on a ('data','model') mesh over `devices`.

    Works identically in single-process (all devices local) and multi-process
    (jax.devices() global, each process contributing its local shard of the
    batch) settings.
    """
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hidvae_tpu.parallel.mesh import make_mesh
    from hidvae_tpu.train.common import TrainState
    from hidvae_tpu.train.hidvae import make_train_step

    model, x, te, ti = _model_and_batch()
    mesh = make_mesh(devices=devices)
    b_shard = NamedSharding(mesh, P("data"))
    r_shard = NamedSharding(mesh, P())

    def put_batch(host):
        n_local = sum(1 for d in devices if d.process_index == jax.process_index())
        if n_local == len(devices):
            return jax.device_put(host, b_shard)
        # Multi-process: contribute only the rows this process's devices own.
        rows = BATCH // jax.process_count()
        local = host[jax.process_index() * rows : (jax.process_index() + 1) * rows]
        return jax.make_array_from_process_local_data(b_shard, local, host.shape)

    # Explicit PRNG impl: the parent pytest process may have run tests that
    # call configure_runtime() (switching the process default to 'rbg'), while
    # the spawned workers run threefry — with default-impl keys the in-test
    # reference would deterministically diverge from the workers whenever the
    # suite runs other tests first (the round-4 "flake" was exactly this:
    # ranks agreed at 74.05, the polluted parent reference computed 65.06).
    # Impl-pinned keys make the step a pure function of the key values.
    def _key(i):
        return jax.random.key(i, impl="threefry2x32")

    variables = model.init(
        {"params": _key(7), "gumbel": _key(8),
         "dropout": _key(9), "mixup": _key(10)},
        jnp.asarray(x), jnp.asarray(te), jnp.asarray(ti), 0.2, train=True,
    )
    tx = optax.adamw(1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    # Replicate training state across the mesh (identical host values on
    # every process, the standard multi-host pattern).
    state = jax.device_put(state, r_shard)

    step = jax.jit(make_train_step(model, tx, None, 0.2))
    xg, teg, tig = put_batch(x), put_batch(te), put_batch(ti)
    key = _key(11)
    if jax.process_count() > 1:
        # Compile before communicating: XLA:CPU's Gloo collectives have a
        # hardcoded ~30s timeout, and on a loaded single-core host the two
        # workers' independent compiles can skew arrival at the first
        # collective past it. AOT-compile (no comms), then rendezvous at a
        # coordination-service barrier (gRPC, generous timeout) so both ranks
        # enter the collective within milliseconds.
        from jax._src import distributed

        compiled = step.lower(state, xg, teg, tig, key).compile()
        distributed.global_state.client.wait_at_barrier(
            "hidvae_dist_test_compiled", 600_000
        )
        _, metrics = compiled(state, xg, teg, tig, key)
    else:
        _, metrics = step(state, xg, teg, tig, key)
    return float(metrics["loss"])
