"""Training tests: schedule math, one jit step, loss-goes-down smoke,
data-parallel sharded step on the 8-device CPU mesh, checkpoint round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesod_tpu.data.synthetic import SyntheticDataset
from bayesod_tpu.data import Loader
from bayesod_tpu.models.retinanet import RetinaNet
from bayesod_tpu.ops import anchors as anchor_ops
from bayesod_tpu.parallel import mesh as mesh_lib
from bayesod_tpu.train import (
    build_train_step,
    create_train_state,
    make_lr_schedule,
)
from bayesod_tpu.utils.config import (
    AnchorConfig,
    DataConfig,
    ExperimentConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)
from bayesod_tpu.utils.config import BayesConfig


def tiny_cfg(batch=2, norm="groupnorm", augment=True):
    return ExperimentConfig(
        name="train_tiny",
        model=ModelConfig(
            num_classes=3, backbone="resnet18", fpn_channels=32,
            head_depth=1, head_channels=32, norm=norm, compute_dtype="float32",
        ),
        data=DataConfig(
            dataset="synthetic", image_hw=(128, 128), max_gt_boxes=8,
            augment_flip=augment,
        ),
        train=TrainConfig(
            batch_size=batch, base_lr=1e-3, warmup_steps=2, total_steps=50,
            lr_decay_steps=(30, 40), checkpoint_every=1000, log_every=10,
        ),
    )


def make_batch(cfg, seed=0):
    ds = SyntheticDataset(size=64, image_hw=cfg.data.image_hw, seed=seed)
    loader = Loader(
        ds, batch_size=cfg.train.batch_size, image_hw=cfg.data.image_hw,
        max_gt_boxes=cfg.data.max_gt_boxes, num_epochs=1, num_workers=1,
    )
    return next(iter(loader))


class TestSchedule:
    def test_warmup_then_decay(self):
        tc = TrainConfig(
            base_lr=1.0, warmup_steps=10, lr_decay_steps=(100, 200),
            lr_decay_factor=0.1,
        )
        sched = make_lr_schedule(tc)
        assert float(sched(0)) == pytest.approx(0.1)
        assert float(sched(9)) == pytest.approx(1.0)
        assert float(sched(50)) == pytest.approx(1.0)
        assert float(sched(150)) == pytest.approx(0.1)
        assert float(sched(250)) == pytest.approx(0.01)

    def test_cosine_warmup_peak_and_floor(self):
        tc = TrainConfig(
            base_lr=1.0, warmup_steps=10, total_steps=100,
            lr_schedule="cosine", lr_min_factor=0.01,
        )
        sched = make_lr_schedule(tc)
        assert float(sched(10)) == pytest.approx(1.0)
        assert float(sched(100)) == pytest.approx(0.01, abs=1e-6)
        assert float(sched(200)) == pytest.approx(0.01, abs=1e-6)  # clamped
        vals = [float(sched(s)) for s in (10, 30, 60, 90)]
        assert all(a > b for a, b in zip(vals, vals[1:]))
        # Cosine midpoint of the decay span sits halfway peak->floor.
        assert float(sched(55)) == pytest.approx((1.0 + 0.01) / 2, rel=0.05)

    def test_unknown_schedule_raises(self):
        with pytest.raises(ValueError, match="lr_schedule"):
            make_lr_schedule(TrainConfig(lr_schedule="nope"))

    def test_spans_count_microsteps_under_accumulation(self):
        """TrainConfig step quantities count train-step CALLS; with
        grad_accum_steps=k the inner schedule (advanced once per optimizer
        update by MultiSteps) must compress spans by k so the anneal
        completes when the loop hits total_steps."""
        tc = TrainConfig(
            base_lr=1.0, warmup_steps=20, total_steps=100,
            lr_schedule="cosine", lr_min_factor=0.01, grad_accum_steps=4,
        )
        sched = make_lr_schedule(tc)  # argument counts optimizer updates
        assert float(sched(5)) == pytest.approx(1.0)  # 20 microsteps
        assert float(sched(25)) == pytest.approx(0.01, abs=1e-6)  # 100
        assert float(sched(100)) == pytest.approx(0.01, abs=1e-6)

    def test_step_boundaries_collapsing_compound(self):
        """Coarse accumulation collapsing two decay boundaries onto one
        update still applies both decay factors."""
        tc = TrainConfig(
            base_lr=1.0, warmup_steps=0, lr_decay_steps=(10, 12),
            lr_decay_factor=0.1, grad_accum_steps=8,
        )
        sched = make_lr_schedule(tc)
        assert float(sched(0)) == pytest.approx(1.0)
        assert float(sched(3)) == pytest.approx(0.01)


class TestGradAccumulation:
    """grad_accum_steps=k averages k microbatch grads into ONE optimizer
    update (optax.MultiSteps). With identical microbatches and dropout off,
    k accumulated microsteps must reproduce the single-step update exactly,
    and params must NOT move on non-apply microsteps."""

    def _cfg(self, accum):
        base = tiny_cfg(augment=False)
        return dataclasses_replace_train(
            base,
            model=ModelConfig(
                num_classes=3, backbone="resnet18", fpn_channels=32,
                head_depth=1, head_channels=32, norm="groupnorm",
                compute_dtype="float32", dropout_rate=0.0,
            ),
            train=TrainConfig(
                batch_size=2, base_lr=1e-3, warmup_steps=0, total_steps=50,
                grad_accum_steps=accum, checkpoint_every=1000, log_every=10,
            ),
        )

    def test_accum_matches_single_step(self):
        cfg1 = self._cfg(1)
        cfg2 = self._cfg(2)
        anchors = anchor_ops.generate_anchors(cfg1.data.image_hw, cfg1.anchors)
        batch = make_batch(cfg1)

        model1 = RetinaNet(cfg=cfg1.model, train=True)
        s1 = create_train_state(
            model1, cfg1.train, jax.random.PRNGKey(0), cfg1.data.image_hw
        )
        step1 = jax.jit(build_train_step(cfg1, anchors, model1))
        s1_after, _ = step1(s1, batch)

        model2 = RetinaNet(cfg=cfg2.model, train=True)
        s2 = create_train_state(
            model2, cfg2.train, jax.random.PRNGKey(0), cfg2.data.image_hw
        )
        step2 = jax.jit(build_train_step(cfg2, anchors, model2))
        s2_mid, _ = step2(s2, batch)
        # Non-apply microstep: params untouched.
        for a, b in zip(
            jax.tree_util.tree_leaves(s2.params),
            jax.tree_util.tree_leaves(s2_mid.params),
        ):
            np.testing.assert_array_equal(np.array(a), np.array(b))
        s2_after, _ = step2(s2_mid, batch)
        # Apply microstep: identical to the unaccumulated update.
        for a, b in zip(
            jax.tree_util.tree_leaves(s1_after.params),
            jax.tree_util.tree_leaves(s2_after.params),
        ):
            np.testing.assert_allclose(
                np.array(a), np.array(b), rtol=1e-5, atol=1e-7
            )


def dataclasses_replace_train(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = tiny_cfg()
    model = RetinaNet(cfg=cfg.model, train=True)
    anchors = anchor_ops.generate_anchors(cfg.data.image_hw, cfg.anchors)
    state = create_train_state(
        model, cfg.train, jax.random.PRNGKey(0), cfg.data.image_hw
    )
    return cfg, model, anchors, state


class TestTrainStep:
    def test_one_step_finite_and_advances(self, tiny_setup):
        cfg, model, anchors, state = tiny_setup
        step_fn = jax.jit(build_train_step(cfg, anchors, model))
        batch = make_batch(cfg)
        new_state, metrics = step_fn(state, batch)
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["grad_norm"]))
        assert float(metrics["num_positive"]) > 0  # synthetic boxes matched

    def test_params_change(self, tiny_setup):
        cfg, model, anchors, state = tiny_setup
        step_fn = jax.jit(build_train_step(cfg, anchors, model))
        batch = make_batch(cfg)
        new_state, _ = step_fn(state, batch)
        leaves_old = jax.tree_util.tree_leaves(state.params)
        leaves_new = jax.tree_util.tree_leaves(new_state.params)
        changed = any(
            not np.allclose(np.array(a), np.array(b))
            for a, b in zip(leaves_old, leaves_new)
        )
        assert changed

    def test_loss_decreases_on_fixed_batch(self, tiny_setup):
        cfg, model, anchors, state = tiny_setup
        step_fn = jax.jit(build_train_step(cfg, anchors, model))
        batch = make_batch(cfg)
        first = None
        for _ in range(12):
            state, metrics = step_fn(state, batch)
            if first is None:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) < first

    def test_batchnorm_stats_update(self):
        cfg = tiny_cfg(norm="batchnorm")
        model = RetinaNet(cfg=cfg.model, train=True)
        anchors = anchor_ops.generate_anchors(cfg.data.image_hw, cfg.anchors)
        state = create_train_state(
            model, cfg.train, jax.random.PRNGKey(0), cfg.data.image_hw
        )
        step_fn = jax.jit(build_train_step(cfg, anchors, model))
        batch = make_batch(cfg)
        new_state, _ = step_fn(state, batch)
        old = jax.tree_util.tree_leaves(state.batch_stats)
        new = jax.tree_util.tree_leaves(new_state.batch_stats)
        assert any(
            not np.allclose(np.array(a), np.array(b)) for a, b in zip(old, new)
        )


class TestShardedTrainStep:
    def test_data_parallel_step_8_devices(self, cpu_devices):
        cfg = tiny_cfg(batch=8)
        model = RetinaNet(cfg=cfg.model, train=True)
        anchors = anchor_ops.generate_anchors(cfg.data.image_hw, cfg.anchors)
        state = create_train_state(
            model, cfg.train, jax.random.PRNGKey(0), cfg.data.image_hw
        )
        mesh = mesh_lib.make_mesh(cfg.mesh)
        assert mesh.devices.shape == (8, 1)
        state = mesh_lib.replicate_state(state, mesh)
        step_fn = jax.jit(
            build_train_step(cfg, anchors, model),
            in_shardings=(
                mesh_lib.replicated(mesh),
                mesh_lib.batch_sharding(mesh, cfg.mesh),
            ),
            out_shardings=(
                mesh_lib.replicated(mesh),
                mesh_lib.replicated(mesh),
            ),
        )
        batch = mesh_lib.shard_batch(make_batch(cfg), mesh, cfg.mesh)
        new_state, metrics = step_fn(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1

    def test_sharded_matches_single_device(self, cpu_devices):
        """DP over 8 devices must be numerically ~identical to 1 device."""
        cfg = tiny_cfg(batch=8, augment=False)
        model = RetinaNet(cfg=cfg.model, train=True)
        anchors = anchor_ops.generate_anchors(cfg.data.image_hw, cfg.anchors)
        state = create_train_state(
            model, cfg.train, jax.random.PRNGKey(0), cfg.data.image_hw
        )
        batch = make_batch(cfg)

        step_single = jax.jit(build_train_step(cfg, anchors, model))
        _, m_single = step_single(state, batch)

        mesh = mesh_lib.make_mesh(cfg.mesh)
        step_sharded = jax.jit(
            build_train_step(cfg, anchors, model),
            in_shardings=(
                mesh_lib.replicated(mesh),
                mesh_lib.batch_sharding(mesh, cfg.mesh),
            ),
            out_shardings=(
                mesh_lib.replicated(mesh),
                mesh_lib.replicated(mesh),
            ),
        )
        _, m_sharded = step_sharded(
            mesh_lib.replicate_state(state, mesh),
            mesh_lib.shard_batch(batch, mesh, cfg.mesh),
        )
        np.testing.assert_allclose(
            float(m_single["loss"]), float(m_sharded["loss"]), rtol=2e-4
        )


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path, tiny_setup):
        from bayesod_tpu.train import CheckpointManager

        cfg, model, anchors, state = tiny_setup
        mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2, async_save=False)
        step_fn = jax.jit(build_train_step(cfg, anchors, model))
        batch = make_batch(cfg)
        state1, _ = step_fn(state, batch)
        mgr.save(state1)
        mgr.wait()
        template = create_train_state(
            model, cfg.train, jax.random.PRNGKey(0), cfg.data.image_hw
        )
        restored = mgr.restore(template)
        assert restored is not None
        assert int(restored.step) == 1
        for a, b in zip(
            jax.tree_util.tree_leaves(state1.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-7)
        mgr.close()

    def test_restore_none_when_empty(self, tmp_path, tiny_setup):
        from bayesod_tpu.train import CheckpointManager

        cfg, model, anchors, state = tiny_setup
        mgr = CheckpointManager(str(tmp_path / "empty"), async_save=False)
        assert mgr.restore(state) is None
        mgr.close()


class TestEMA:
    """TrainConfig.ema_decay: e <- d*e + (1-d)*p each step, initialized AT
    the init params; checkpoints carry it; variables(use_ema=True) serves it."""

    def _setup(self, decay):
        import dataclasses

        cfg = tiny_cfg()
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, ema_decay=decay)
        )
        model = RetinaNet(cfg=cfg.model, train=True)
        anchors = anchor_ops.generate_anchors(cfg.data.image_hw, cfg.anchors)
        state = create_train_state(
            model, cfg.train, jax.random.PRNGKey(0), cfg.data.image_hw
        )
        return cfg, model, anchors, state

    def test_ema_matches_reference_recursion(self):
        cfg, model, anchors, state = self._setup(decay=0.9)
        step_fn = jax.jit(build_train_step(cfg, anchors, model))
        batch = make_batch(cfg)
        # Host-side oracle of the same recursion.
        ema = jax.tree_util.tree_map(
            lambda p: np.asarray(p, np.float64), state.params
        )
        for _ in range(3):
            state, _ = step_fn(state, batch)
            ema = jax.tree_util.tree_map(
                lambda e, p: 0.9 * e + 0.1 * np.asarray(p, np.float64),
                ema, state.params,
            )
        for a, b in zip(
            jax.tree_util.tree_leaves(state.ema_params),
            jax.tree_util.tree_leaves(ema),
        ):
            np.testing.assert_allclose(np.asarray(a), b, rtol=1e-5, atol=1e-6)
        # EMA lags the raw params (decay 0.9 over 3 steps).
        diffs = [
            float(np.abs(np.asarray(e) - np.asarray(p)).max())
            for e, p in zip(
                jax.tree_util.tree_leaves(state.ema_params),
                jax.tree_util.tree_leaves(state.params),
            )
        ]
        assert max(diffs) > 0.0

    def test_ema_off_keeps_empty_tree(self):
        cfg, model, anchors, state = self._setup(decay=0.0)
        assert state.ema_params == {}
        step_fn = jax.jit(build_train_step(cfg, anchors, model))
        state, _ = step_fn(state, make_batch(cfg))
        assert state.ema_params == {}
        with pytest.raises(ValueError, match="no EMA params"):
            state.variables(use_ema=True)

    def test_ema_checkpoint_roundtrip_and_serving(self, tmp_path):
        from bayesod_tpu.train import CheckpointManager

        cfg, model, anchors, state = self._setup(decay=0.5)
        step_fn = jax.jit(build_train_step(cfg, anchors, model))
        state, _ = step_fn(state, make_batch(cfg))
        mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=False)
        mgr.save(state)
        mgr.wait()
        template = create_train_state(
            model, cfg.train, jax.random.PRNGKey(1), cfg.data.image_hw
        )
        restored = mgr.restore(template)
        mgr.close()
        for a, b in zip(
            jax.tree_util.tree_leaves(state.ema_params),
            jax.tree_util.tree_leaves(restored.ema_params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
        v = restored.variables(use_ema=True)
        for a, b in zip(
            jax.tree_util.tree_leaves(v["params"]),
            jax.tree_util.tree_leaves(restored.ema_params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


    def test_restore_migrates_pre_ema_checkpoint(self, tmp_path):
        """A checkpoint saved WITHOUT ema_params (ema_decay=0 or older code)
        restores into an EMA-enabled template: EMA initialized AT the
        restored params instead of failing the Orbax structure match."""
        from bayesod_tpu.train import CheckpointManager

        cfg0, model, anchors, state0 = self._setup(decay=0.0)
        assert state0.ema_params == {}
        step_fn = jax.jit(build_train_step(cfg0, anchors, model))
        state0, _ = step_fn(state0, make_batch(cfg0))
        mgr = CheckpointManager(str(tmp_path / "old"), async_save=False)
        mgr.save(state0)
        mgr.wait()

        cfg1, model1, _, _ = self._setup(decay=0.9)
        template = create_train_state(
            model1, cfg1.train, jax.random.PRNGKey(7), cfg1.data.image_hw
        )
        assert template.ema_params  # EMA-enabled template
        restored = mgr.restore(template)
        mgr.close()
        assert restored is not None and int(restored.step) == 1
        for e, p in zip(
            jax.tree_util.tree_leaves(restored.ema_params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_array_equal(np.asarray(e), np.asarray(p))


class TestEvalStep:
    def test_val_loss_logged_and_deterministic(self, tmp_path):
        """eval_every logs val/ metrics from fixed batches; the eval step is
        deterministic (no dropout/augmentation) so two calls agree."""
        import dataclasses
        import json

        from bayesod_tpu.train import train
        from bayesod_tpu.train.step import build_eval_step

        cfg = tiny_cfg()
        cfg = dataclasses.replace(
            cfg,
            train=dataclasses.replace(
                cfg.train, eval_every=2, eval_batches=2
            ),
        )
        seen = {}

        def on_metrics(step, m):
            seen.update({k: v for k, v in m.items() if k.startswith("val/")})

        train(
            cfg, max_steps=2, out_dir=str(tmp_path / "run"),
            on_metrics=on_metrics, devices=jax.devices()[:1],
        )
        assert "val/loss" in seen and np.isfinite(seen["val/loss"])
        lines = [
            json.loads(l)
            for l in open(tmp_path / "run" / "metrics.jsonl")
        ]
        assert any("val/loss" in l for l in lines)

        # determinism of the bare eval step
        model = RetinaNet(cfg=cfg.model, train=False)
        anchors = anchor_ops.generate_anchors(cfg.data.image_hw, cfg.anchors)
        state = create_train_state(
            model, cfg.train, jax.random.PRNGKey(0), cfg.data.image_hw
        )
        step = jax.jit(build_eval_step(cfg, anchors, model))
        batch = make_batch(cfg)
        m1 = step(state, batch)
        m2 = step(state, batch)
        assert float(m1["loss"]) == float(m2["loss"])



class TestBlockRemat:
    """TrainConfig.remat='blocks': per-residual-block rematerialization.

    The lifted nn.remat must be semantics-free: identical variable tree
    (checkpoints interchangeable) and an identical training trajectory —
    only the backward's saved-tensor schedule changes."""

    @pytest.mark.parametrize("norm", ["groupnorm", "batchnorm"])
    def test_step_parity_with_no_remat(self, norm):
        import dataclasses

        from bayesod_tpu.train import make_train_model

        cfg = tiny_cfg(norm=norm, augment=False)
        cfg_r = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, remat="blocks")
        )
        anchors = anchor_ops.generate_anchors(cfg.data.image_hw, cfg.anchors)
        batch = make_batch(cfg)

        model = make_train_model(cfg)
        model_r = make_train_model(cfg_r)
        assert model.block_remat is False and model_r.block_remat is True
        state = create_train_state(
            model, cfg.train, jax.random.PRNGKey(0), cfg.data.image_hw
        )
        state_r = create_train_state(
            model_r, cfg_r.train, jax.random.PRNGKey(0), cfg.data.image_hw
        )
        # Same variable tree: remat adds no scope level.
        assert jax.tree_util.tree_structure(
            state.params
        ) == jax.tree_util.tree_structure(state_r.params)

        s1, m1 = jax.jit(build_train_step(cfg, anchors, model))(state, batch)
        s2, m2 = jax.jit(build_train_step(cfg_r, anchors, model_r))(
            state_r, batch
        )
        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(s1.params),
            jax.tree_util.tree_leaves(s2.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            )
        if norm == "batchnorm":
            for a, b in zip(
                jax.tree_util.tree_leaves(s1.batch_stats),
                jax.tree_util.tree_leaves(s2.batch_stats),
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
                )

    def test_unknown_remat_rejected(self):
        import dataclasses

        cfg = tiny_cfg()
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, remat="bogus")
        )
        anchors = anchor_ops.generate_anchors(cfg.data.image_hw, cfg.anchors)
        with pytest.raises(ValueError, match="remat"):
            build_train_step(cfg, anchors)


class TestWeightsNpz:
    """save_weights_npz / --weights_npz archives (the git-committable
    serving-weights form; train/checkpoint.py)."""

    def _state(self, cfg, seed=0):
        import dataclasses

        model = RetinaNet(cfg=cfg.model, train=True)
        return model, create_train_state(
            model,
            dataclasses.replace(cfg.train, ema_decay=0.9),
            jax.random.PRNGKey(seed),
            cfg.data.image_hw,
        )

    def test_roundtrip_params_stats_ema_step(self, tmp_path):
        import dataclasses

        from bayesod_tpu.train import load_weights_npz, save_weights_npz
        from bayesod_tpu.train.checkpoint import restore_state

        cfg = tiny_cfg(norm="batchnorm")
        model, state = self._state(cfg)
        # Perturb so a successful load is distinguishable from a fresh
        # template: params +1, ema +2, step 7.
        state = state.replace(
            params=jax.tree_util.tree_map(lambda x: x + 1.0, state.params),
            ema_params=jax.tree_util.tree_map(
                lambda x: x + 2.0, state.params
            ),
            step=jnp.asarray(7, jnp.int32),
        )
        path = str(tmp_path / "w.npz")
        n = save_weights_npz(state, path)
        assert n > 1

        _, template = self._state(cfg, seed=3)
        loaded = load_weights_npz(template, path)
        assert int(loaded.step) == 7
        for coll in ("params", "batch_stats", "ema_params"):
            got = jax.tree_util.tree_leaves(getattr(loaded, coll))
            want = jax.tree_util.tree_leaves(getattr(state, coll))
            assert len(got) == len(want)
            if coll == "params":
                assert len(got) > 0
            for a, b in zip(want, got, strict=True):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # restore_state end-to-end routing (needs ema in cfg for template).
        cfg_ema = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, ema_decay=0.9)
        )
        st2 = restore_state(cfg_ema, weights_npz=path, model=None)
        assert int(st2.step) == 7

    def test_mismatched_config_is_loud(self, tmp_path):
        from bayesod_tpu.train import load_weights_npz, save_weights_npz

        cfg = tiny_cfg(norm="batchnorm")
        _, state = self._state(cfg)
        path = str(tmp_path / "w.npz")
        save_weights_npz(state, path)
        import dataclasses

        other = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, head_channels=16)
        )
        _, template = self._state(other)
        with pytest.raises(ValueError, match="does not match"):
            load_weights_npz(template, path)
