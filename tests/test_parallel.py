"""Multi-chip emulation tests on the 8-device virtual CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hidvae_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicated_sharding,
    shard_batch,
)


@pytest.fixture(scope="module")
def devices():
    return jax.devices()


class TestMesh:
    def test_eight_virtual_devices(self, devices):
        assert len(devices) == 8, "conftest should provide 8 virtual CPU devices"

    def test_make_mesh_shapes(self):
        mesh = make_mesh()
        assert mesh.shape == {"data": 8, "model": 1}
        mesh2 = make_mesh(n_data=4, n_model=2)
        assert mesh2.shape == {"data": 4, "model": 2}

    def test_shard_batch_places_data_axis(self):
        mesh = make_mesh()
        x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
        sharded = shard_batch(mesh, {"x": x})
        shard_shapes = [s.data.shape for s in sharded["x"].addressable_shards]
        assert all(s == (2, 4) for s in shard_shapes)

    def test_pad_to_multiple(self):
        batch = {"x": jnp.ones((5, 3))}
        padded, n = pad_to_multiple(batch, 8)
        assert n == 5 and padded["x"].shape == (8, 3)


class TestDataParallelEquivalence:
    def test_sharded_loss_matches_single_device(self):
        """A DP-sharded forward must produce the same loss as replicated."""
        from hidvae_tpu.models.rqvae import RqVae
        from hidvae_tpu.models.quantize import QuantizeForwardMode

        model = RqVae(input_dim=16, embed_dim=8, hidden_dims=(16,),
                      codebook_size=16, n_layers=2, n_cat_features=0,
                      codebook_mode=QuantizeForwardMode.STE)
        x = jax.random.normal(jax.random.key(0), (32, 16))
        variables = model.init({"params": jax.random.key(1), "gumbel": jax.random.key(2)},
                               x, 0.2, train=False)

        def loss_fn(x):
            return model.apply(variables, x, 0.2, train=False).loss

        mesh = make_mesh()
        x_sharded = jax.device_put(x, batch_sharding(mesh))
        x_repl = jax.device_put(x, replicated_sharding(mesh))
        l_sharded = float(jax.jit(loss_fn)(x_sharded))
        l_repl = float(jax.jit(loss_fn)(x_repl))
        np.testing.assert_allclose(l_sharded, l_repl, rtol=1e-5)

    def test_dp_gradients_match(self):
        """DP-sharded gradient == single-device gradient on the same batch
        (XLA inserts the all-reduce implied by the replicated output)."""
        from hidvae_tpu.models.retrieval import EncoderDecoderRetrievalModel
        from __graft_entry__ import _example_batch

        model = EncoderDecoderRetrievalModel(
            embedding_dim=16, attn_dim=32, dropout=0.0, num_heads=2, n_layers=2,
            num_embeddings=32, sem_id_dim=3, max_pos=32, n_sem_layers=3,
        )
        batch = _example_batch(b=16, n=4, d=3, k=32)
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, False
        )

        def grad_fn(params, batch):
            return jax.grad(
                lambda p: model.apply({"params": p}, batch, False).loss
            )(params)

        mesh = make_mesh()
        g_repl = jax.jit(grad_fn)(variables["params"], batch)
        batch_sh = shard_batch(mesh, batch)
        g_shard = jax.jit(grad_fn)(variables["params"], batch_sh)
        flat_r = jax.tree_util.tree_leaves(g_repl)
        flat_s = jax.tree_util.tree_leaves(g_shard)
        for a, b in zip(flat_r, flat_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-5)


class TestGraftEntry:
    def test_entry_jits(self):
        from __graft_entry__ import entry

        fn, args = entry()
        loss = jax.jit(fn)(*args)
        assert np.isfinite(float(loss))

    @pytest.mark.parametrize("n", [2, 4, 8])
    def test_dryrun_multichip(self, n):
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(n)

    def test_dryrun_multichip_hostile_env(self):
        """Regression for the round-1/2 driver failures (MULTICHIP_r0{1,2}):
        env vars that LOOK provisioned — JAX_PLATFORMS=cpu plus a bare
        (ineffective, no '--' prefix) xla_force_host_platform_device_count
        token — must never be trusted; dryrun_multichip must still re-exec
        into a sanitized subprocess and pass."""
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        env.pop("HIDVAE_DRYRUN_INNER", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "xla_force_host_platform_device_count=8"
        code = (
            f"import sys; sys.path.insert(0, {repo!r}); "
            "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
        )
        r = subprocess.run(
            [sys.executable, "-c", code], env=env, cwd=repo,
            capture_output=True, text=True, timeout=560,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "dryrun_multichip OK" in r.stdout


# Failure signatures of the rendezvous/collective LAYER (coordination-service
# gRPC deadlines, Gloo's hardcoded ~30s store timeouts, TCP setup) — on this
# one-core host any concurrent heavy process can starve workers past these
# fixed deadlines, which is an environment flake, not a collectives
# regression. Anything else (assertion, crash, loss mismatch) fails hard.
_RETRYABLE_DIST_ERRORS = (
    "DEADLINE_EXCEEDED", "Timed out", "timed out", "wait_at_barrier",
    "Connection refused", "Connection reset", "Socket closed",
    "UNAVAILABLE", "parent-side communicate timeout",
)


def _launch_dist_workers():
    """Launch the two-OS-process Gloo DP workers and wait for both; returns
    (procs, [(stdout, stderr)]). Wedged workers are always killed so they
    cannot hold the coordination port / CPU core for the rest of the suite.
    A parent-side wait timeout is reported as a normal failed attempt
    (killed workers, synthetic stderr) instead of raising, so the caller's
    retry logic sees it."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache",
            HIDVAE_DISTRIBUTED="1",
            HIDVAE_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            HIDVAE_NUM_PROCESSES="2",
            HIDVAE_PROCESS_ID=str(pid),
            # Match the (conftest-sanitized) parent's default PRNG so the
            # in-test reference loss is comparable.
            HIDVAE_PRNG_IMPL="threefry2x32",
            PYTHONPATH=repo,
        )
        for key in ("PALLAS_AXON_POOL_IPS", "AXON_LOOPBACK_RELAY",
                    "PALLAS_AXON_REMOTE_COMPILE"):
            env.pop(key, None)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(repo, "tests", "_dist_worker.py")],
            env=env, cwd=repo, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        ))
    try:
        outs = [p.communicate(timeout=600) for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            if p.poll() is None:
                p.kill()
        outs = []
        for p in procs:
            try:
                out, err = p.communicate(timeout=30)
            except Exception:
                out, err = "", ""
            outs.append((out, err + "\nparent-side communicate timeout"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    return procs, outs


class TestDistributedInit:
    def test_single_process_distributed_init(self):
        """HIDVAE_DISTRIBUTED=1 drives jax.distributed.initialize (the
        reference's multi-node Accelerate surface, SURVEY §5.8); exercised in
        single-process form in a subprocess so this process's runtime is
        untouched."""
        import socket
        import subprocess
        import sys

        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]

        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            HIDVAE_DISTRIBUTED="1",
            HIDVAE_COORDINATOR_ADDRESS=f"localhost:{port}",
            HIDVAE_NUM_PROCESSES="1",
            HIDVAE_PROCESS_ID="0",
        )
        env.pop("PALLAS_AXON_POOL_IPS", None)
        code = (
            "import jax, jax.numpy as jnp\n"
            "from hidvae_tpu.utils.runtime import configure_runtime\n"
            "configure_runtime()\n"
            "assert jax.process_count() == 1, jax.process_count()\n"
            "out = jax.jit(lambda x: jnp.sum(x))(jnp.ones(8))\n"
            "print('DIST_OK', float(out), jax.process_index())\n"
        )
        res = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=240,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        assert "DIST_OK 8.0 0" in res.stdout

    def test_two_process_dp_train_step(self):
        """REAL multi-host semantics: two OS processes, 2 CPU devices each,
        Gloo collectives between them. Both ranks run one DP-sharded stage-1
        train step over the 4-device global mesh (each contributing its local
        batch shard) and must agree with each other exactly and with a
        single-process run of the identical step (tests/_dist_common.py) to
        float tolerance. Covers the reference's multi-node Accelerate DDP
        surface (SURVEY §2.7) end-to-end, not just the init call."""
        import re

        for attempt in (1, 2, 3):
            procs, outs = _launch_dist_workers()
            failures = [
                (p.returncode, err[-3000:])
                for p, (_, err) in zip(procs, outs) if p.returncode != 0
            ]
            if not failures:
                break
            retryable = any(
                tok in err for _, err in failures
                for tok in _RETRYABLE_DIST_ERRORS
            )
            # Retry ONLY known rendezvous/collective-deadline starvation
            # (see _RETRYABLE_DIST_ERRORS); real worker crashes fail hard and
            # the last attempt always fails hard.
            assert retryable and attempt < 3, (
                f"dist workers failed (attempt {attempt}, "
                f"retryable={retryable}): {failures}"
            )
        losses = {}
        for p, (out, err) in zip(procs, outs):
            m = re.search(r"DIST_LOSS (\d) ([\d.]+)", out)
            assert m, (out, err[-2000:])
            losses[int(m.group(1))] = float(m.group(2))
        assert set(losses) == {0, 1}
        # Replicated loss: bit-identical across ranks.
        assert losses[0] == losses[1], losses

        # Single-process reference over 4 of this process's virtual devices.
        from tests._dist_common import run_one_step

        ref = run_one_step(jax.devices()[:4])
        np.testing.assert_allclose(losses[0], ref, rtol=1e-4)


class TestTrainerMultiDevice:
    """VERDICT #6: real trainer runs on the 8-device mesh, not just one-step
    dryruns — loss trajectories must match the single-device run, and the
    stage-2 trainer's tensor-parallel option must actually shard parameters."""

    @pytest.fixture()
    def dataset_root(self, tmp_path):
        from hidvae_tpu.data.processed import RecDataset, processed_path
        from hidvae_tpu.data.synthetic import build_synthetic

        root = str(tmp_path / "synth")
        arrays = build_synthetic(
            n_items=200, n_users=40, feature_dim=32, tag_dim=16,
            max_seq_len=8, min_seq_len=4, level_branching=(4, 2, 2),
        )
        arrays.save(processed_path(root, RecDataset.SYNTHETIC))
        return root

    def _hidvae_common(self, dataset_root, out):
        from hidvae_tpu.data.processed import RecDataset

        return dict(
            iterations=6, batch_size=16, learning_rate=1e-3,
            dataset_folder=dataset_root, dataset=RecDataset.SYNTHETIC,
            save_dir_root=out, eval_every=10_000, do_eval=False,
            save_model_every=10_000,
            vae_input_dim=32, vae_n_cat_feats=0, vae_hidden_dims=(32, 16),
            vae_embed_dim=8, vae_codebook_size=32, vae_n_layers=3,
            tag_embed_dim=16, rare_tag_threshold=3,
            log_every=2, make_plots=False, seed=11,
        )

    def test_hidvae_loss_trajectory_matches_single_device(
        self, dataset_root, tmp_path, monkeypatch
    ):
        from hidvae_tpu.train.hidvae import train

        monkeypatch.setenv("HIDVAE_MESH_DEVICES", "1")
        single = train(**self._hidvae_common(dataset_root, str(tmp_path / "s")))
        monkeypatch.delenv("HIDVAE_MESH_DEVICES")
        assert len(jax.devices()) == 8
        multi = train(**self._hidvae_common(dataset_root, str(tmp_path / "m")))

        # Same (seed, step) randomness on both meshes; only reduction order
        # differs, so trajectories agree to float tolerance.
        np.testing.assert_allclose(
            np.asarray(single["history"]["total_loss"]),
            np.asarray(multi["history"]["total_loss"]),
            rtol=5e-3, atol=1e-4,
        )

    def test_transformer_trainer_tensor_parallel(self, dataset_root, tmp_path):
        from hidvae_tpu.train.transformer import train
        from hidvae_tpu.data.processed import RecDataset

        result = train(
            iterations=4, batch_size=8, dataset_folder=dataset_root,
            dataset=RecDataset.SYNTHETIC, save_dir_root=str(tmp_path / "out"),
            partial_eval_every=10_000, full_eval_every=10_000,
            save_model_every=10_000,
            vae_input_dim=32, vae_n_cat_feats=0, vae_hidden_dims=(32, 16),
            vae_embed_dim=8, vae_codebook_size=32, vae_n_layers=3,
            use_h_tokenizer=True, tag_embed_dim=16, tag_class_counts=[4, 8, 16],
            decoder_embed_dim=16, attn_embed_dim=32, attn_heads=2, attn_layers=2,
            eval_batches=1, log_every=2, make_plots=False,
            n_model_shards=2,
        )
        assert np.isfinite(result["history"]["train_loss"]).all()
        params = result["state"].params
        out_spec = params["out_proj"]["kernel"].sharding.spec
        assert tuple(out_spec) == (None, "model"), out_spec
        # At least one FF kernel is model-sharded too.
        ff_specs = [
            leaf.sharding.spec
            for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
            if any(getattr(p, "key", "") == "ff" for p in path)
            and getattr(path[-1], "key", "") == "kernel"
        ]
        assert any("model" in tuple(s) for s in ff_specs), ff_specs

    def test_transformer_tensor_parallel_resume_reshards_opt_state(
        self, dataset_root, tmp_path
    ):
        """Resuming under TP must re-lay the restored Adam moments out like
        the sharded params (they are saved/restored unsharded)."""
        from hidvae_tpu.train.transformer import train
        from hidvae_tpu.data.processed import RecDataset

        common = dict(
            batch_size=8, dataset_folder=dataset_root,
            dataset=RecDataset.SYNTHETIC, save_dir_root=str(tmp_path / "out"),
            partial_eval_every=10_000, full_eval_every=10_000,
            save_model_every=2,
            vae_input_dim=32, vae_n_cat_feats=0, vae_hidden_dims=(32, 16),
            vae_embed_dim=8, vae_codebook_size=32, vae_n_layers=3,
            use_h_tokenizer=True, tag_embed_dim=16, tag_class_counts=[4, 8, 16],
            decoder_embed_dim=16, attn_embed_dim=32, attn_heads=2, attn_layers=2,
            eval_batches=1, log_every=2, make_plots=False,
            n_model_shards=2,
        )
        r1 = train(iterations=2, **common)
        r2 = train(
            iterations=2, pretrained_decoder_path=r1["saved_paths"][-1],
            **common,
        )
        assert np.isfinite(r2["history"]["train_loss"]).all()

        def moment_specs(opt_state):
            return [
                tuple(leaf.sharding.spec)
                for leaf in jax.tree_util.tree_leaves(opt_state)
                if hasattr(leaf, "sharding") and leaf.ndim >= 2
            ]

        fresh, resumed = (
            moment_specs(r1["state"].opt_state),
            moment_specs(r2["state"].opt_state),
        )
        assert resumed == fresh
        assert any("model" in s for s in resumed), resumed
