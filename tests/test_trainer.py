"""Trainer orchestration on CPU: tiny end-to-end train -> checkpoint -> resume."""

import os

import jax
import numpy as np
import pytest

from lidar4d_tpu.cli.config import build_loss_config, build_model_config, get_arg_parser
from lidar4d_tpu.data import KITTI360Dataset, generate_synthetic_sequence
from lidar4d_tpu.eval.meters import PointsMeter, RaydropMeter
from lidar4d_tpu.models.lidar4d import LiDAR4DField
from lidar4d_tpu.train.trainer import Trainer

H, W, FRAMES, SEQ = 12, 48, 4, "9000"


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("trainer_synth"))
    scale, offset = generate_synthetic_sequence(
        root, sequence_id=SEQ, num_frames=FRAMES, H=H, W=W, val_every=4
    )
    argv = [
        "--config", "/nonexistent",
        "--path", root, "--sequence_id", SEQ,
        "--scale", str(scale), "--num_frames", str(FRAMES),
        "--num_rays_lidar", "32", "--num_steps", "8",
        "--iters", "12", "--eval_interval", "100",
        "--base_resolution", "8", "--max_resolution", "16",
        "--log2_hashmap_size", "8", "--n_levels_hash", "2",
        "--n_levels_plane", "1", "--min_resolution", "8",
        "--time_resolution", "2", "--hash_size_dynamic", "8", "8", "8",
        "--flow_n_levels", "2", "--flow_log2_hashmap_size", "8",
        "--flow_base_resolution", "8", "--flow_max_resolution", "16",
        "--flow_loss", "false", "--ckpt", "scratch",
    ]
    opt = get_arg_parser().parse_args(argv)
    opt.offset = offset
    opt.near_lidar *= opt.scale
    opt.far_lidar *= opt.scale
    ds = KITTI360Dataset(
        split="train", root_path=root, sequence_id=SEQ,
        scale=scale, offset=offset, num_rays_lidar=32,
    )
    return opt, ds


def test_trainer_train_checkpoint_resume(setup, tmp_path):
    opt, ds = setup
    ws = str(tmp_path / "ws")
    field = LiDAR4DField(build_model_config(opt))
    trainer = Trainer(
        "lidar4d", opt, field, build_loss_config(opt), workspace=ws,
        lidar_metrics=[], use_checkpoint="scratch", eval_interval=100,
    )
    trainer.train_one_epoch(ds, patch_size=1)
    trainer.train_one_epoch(ds, patch_size=1)
    assert trainer.global_step == 2 * len(ds)
    assert trainer.state.ema.num_updates == 2  # per-epoch EMA
    trainer.epoch = 2
    trainer.save_checkpoint()

    # resume picks up epoch + step + params
    t2 = Trainer(
        "lidar4d", opt, field, build_loss_config(opt), workspace=ws,
        lidar_metrics=[], use_checkpoint="latest", eval_interval=100,
    )
    assert t2.epoch == 2
    assert t2.global_step == trainer.global_step
    a = np.asarray(list(trainer.state.params["sigma"])[0])
    b = np.asarray(list(t2.state.params["sigma"])[0])
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_ckpt_interval_skips_intermediate_epochs(setup, tmp_path):
    """ckpt_interval=2 over 3 epochs saves ep2 (interval) and ep3 (final),
    never ep1 — the per-epoch full-state save is ~13 s of device->host
    transfer on the tunneled chip (PERF.md r5), so long schedules thin it."""
    opt, ds = setup
    import copy

    opt2 = copy.copy(opt)
    opt2.ckpt_interval = 2
    ws = str(tmp_path / "ws_interval")
    field = LiDAR4DField(build_model_config(opt2))
    trainer = Trainer(
        "lidar4d", opt2, field, build_loss_config(opt2), workspace=ws,
        lidar_metrics=[], use_checkpoint="scratch", eval_interval=100,
    )
    saved_epochs = []
    orig_save = trainer.ckpt.save_epoch

    def spy(tree, epoch, **kw):
        saved_epochs.append(epoch)
        return orig_save(tree, epoch, **kw)

    trainer.ckpt.save_epoch = spy
    trainer.train(ds, ds, ds, max_epochs=3, run_refine=False)
    assert saved_epochs == [2, 3]  # ep1 skipped; final epoch always saved
    # max_keep=1 leaves only the newest epoch dir on disk
    assert sorted(os.listdir(trainer.ckpt.ckpt_dir)) == ["lidar4d_ep0003"]

    # resume still lands on the final epoch
    t2 = Trainer(
        "lidar4d", opt2, field, build_loss_config(opt2), workspace=ws,
        lidar_metrics=[], use_checkpoint="latest", eval_interval=100,
    )
    assert t2.epoch == 3


def test_latest_path_skips_inflight_orbax_tmp(tmp_path):
    """A concurrent (or killed) writer leaves `*.orbax-checkpoint-tmp` dirs;
    resolving 'latest' onto one raises 'Found incomplete checkpoint' (hit
    live when a resume raced a still-running trainer's save)."""
    from lidar4d_tpu.train.checkpoints import CheckpointManager

    cm = CheckpointManager(str(tmp_path / "ws_tmp"))
    os.makedirs(os.path.join(cm.ckpt_dir, "lidar4d_ep0001"))
    os.makedirs(
        os.path.join(cm.ckpt_dir, "lidar4d_ep0002.orbax-checkpoint-tmp")
    )
    assert cm.latest_path().endswith("lidar4d_ep0001")
    assert cm.latest_path(include_refine=True).endswith("lidar4d_ep0001")


def test_refine_drops_ema(setup, tmp_path):
    """refine() must kill the EMA (runner.py:819-821 sets self.ema = None):
    the U-Net is only trained inside refine, so its EMA shadow is still the
    random init — post-refine evals through ema_params would silently run an
    untrained refiner (caught live: CD 0.22 -> 0.72 on the bench scene)."""
    import jax

    opt, ds = setup
    ws = str(tmp_path / "ws_refine")
    field = LiDAR4DField(build_model_config(opt))
    trainer = Trainer(
        "lidar4d", opt, field, build_loss_config(opt), workspace=ws,
        lidar_metrics=[], use_checkpoint="scratch", eval_interval=100,
    )
    trainer.train_one_epoch(ds, patch_size=1)
    assert trainer.state.ema.num_updates == 1

    refine_ds = KITTI360Dataset(
        split="refine", root_path=opt.path, sequence_id=SEQ,
        scale=opt.scale, offset=opt.offset,
    )
    import lidar4d_tpu.train.trainer as trainer_mod

    orig = trainer_mod.refine_unet

    def tiny_refine(unet, variables, inputs, gts, **kw):
        kw.update(steps=2, log_fn=lambda s: None)
        return orig(unet, variables, inputs, gts, **kw)

    trainer_mod.refine_unet = tiny_refine
    try:
        trainer.refine(refine_ds)
    finally:
        trainer_mod.refine_unet = orig

    # eval params must now BE the refined params (EMA dropped), so the
    # trained U-Net — not its random-init EMA shadow — is what evals use
    assert int(trainer.state.ema.num_updates) == 0
    ev = trainer._eval_params()
    got = jax.tree.leaves(ev["unet"]["params"])[0]
    want = jax.tree.leaves(trainer.state.params["unet"]["params"])[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # ---- standalone reload (train -> exit -> `--test_eval`): a fresh
    # Trainer loading "latest" must overlay the refine checkpoint so its
    # eval params reproduce the in-process post-refine U-Net (VERDICT r2
    # item 4: the full checkpoint's EMA shadow holds an UNTRAINED U-Net).
    trainer.save_checkpoint()  # full state at the same epoch as the refine
    t2 = Trainer(
        "lidar4d", opt, field, build_loss_config(opt), workspace=ws,
        lidar_metrics=[], use_checkpoint="latest", eval_interval=100,
    )
    ev2 = t2._eval_params()
    got2 = jax.tree.leaves(ev2["unet"]["params"])[0]
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(want))

    # both trainers now hold a trained refiner -> use_refine honored
    assert trainer._refine_trained and t2._refine_trained
    assert trainer._resolve_use_refine(True) is True


def test_eval_downgrades_refine_when_unet_untrained(setup, tmp_path):
    """`--test_eval` after a `--train_only` run (no refine stage, no refine
    checkpoint) must NOT mask metrics with the random-init U-Net — observed
    live on ab5: CD 0.882 refined-by-noise vs the true 0.286. The reference
    has the same hole (runner.py:413-416); we downgrade with a loud WARN."""
    opt, ds = setup
    field = LiDAR4DField(build_model_config(opt))
    trainer = Trainer(
        "lidar4d", opt, field, build_loss_config(opt),
        workspace=str(tmp_path / "ws_norefine"), lidar_metrics=[],
        use_checkpoint="scratch", eval_interval=100,
    )
    assert not trainer._refine_trained
    assert trainer._resolve_use_refine(True) is False   # downgraded
    assert trainer._resolve_use_refine(False) is False  # explicit off stays off
    trainer.evaluate(ds)  # e2e: must run unrefined, not crash
    assert trainer.use_refine is False


def test_trainer_builds_hierarchical_mesh_from_flags(setup, tmp_path):
    """--mesh dcn,ici + --num_hosts makes the Trainer train on the 2-axis
    (hosts x per-host chips) mesh — the pod entry path (VERDICT r2 #5) —
    AND the flag-driven hierarchical layout reproduces the unsharded params
    (VERDICT r3 #8: prove the flag path, not just the parallel.mesh helper)."""
    import copy

    opt, ds = setup
    opt = copy.deepcopy(opt)
    opt.mesh = "dcn,ici"
    opt.num_hosts = 2
    opt.num_devices = 8
    field = LiDAR4DField(build_model_config(opt))
    trainer = Trainer(
        "lidar4d", opt, field, build_loss_config(opt),
        workspace=str(tmp_path / "ws_mesh"), lidar_metrics=[],
        use_checkpoint="scratch", eval_interval=100,
    )
    assert trainer.mesh is not None
    assert trainer.mesh.axis_names == ("dcn", "ici")
    assert trainer.mesh.devices.shape == (2, 4)
    trainer.train_one_epoch(ds, patch_size=1)
    assert trainer.global_step == len(ds)
    assert np.isfinite(trainer.stats["loss"][-1])

    # same seed, same data, no mesh: identical epoch-order and step keys, so
    # the hierarchical DP run must land on the same params
    opt1 = copy.deepcopy(opt)
    opt1.num_devices = 1
    t1 = Trainer(
        "lidar4d", opt1, field, build_loss_config(opt1),
        workspace=str(tmp_path / "ws_nomesh"), lidar_metrics=[],
        use_checkpoint="scratch", eval_interval=100,
    )
    assert t1.mesh is None
    t1.train_one_epoch(ds, patch_size=1)
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(trainer.state.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-6)


def test_best_checkpoint_rejects_nonfinite(setup, tmp_path):
    """r3 incident: a NaN-poisoned eval wrote `best_result = inf`. A
    non-finite eval result must never produce a best checkpoint."""
    opt, ds = setup
    ws = str(tmp_path / "ws_best")
    field = LiDAR4DField(build_model_config(opt))
    trainer = Trainer(
        "lidar4d", opt, field, build_loss_config(opt), workspace=ws,
        lidar_metrics=[], use_checkpoint="scratch", eval_interval=100,
    )
    for poisoned in (float("inf"), float("nan")):
        trainer.stats["results"].append(poisoned)
        trainer.save_checkpoint(best=True)
        assert trainer.ckpt.best_path() is None
        assert trainer.stats["best_result"] is None
    trainer.stats["results"].append(1.0)
    trainer.save_checkpoint(best=True)
    assert trainer.ckpt.best_path() is not None
    assert trainer.stats["best_result"] == 1.0


def test_param_finiteness_sentinel(setup, tmp_path):
    """r3 incident: printed losses stayed finite while every Adam-managed
    param was NaN. The per-epoch sentinel must halt loudly on poisoned
    params and pass on healthy ones."""
    opt, ds = setup
    field = LiDAR4DField(build_model_config(opt))
    trainer = Trainer(
        "lidar4d", opt, field, build_loss_config(opt),
        workspace=str(tmp_path / "ws_finite"), lidar_metrics=[],
        use_checkpoint="scratch", eval_interval=100,
    )
    trainer._assert_params_finite()  # healthy params pass

    params = dict(trainer.state.params)
    leaf = np.asarray(params["hash"]["static"]).copy()
    leaf.reshape(-1)[0] = np.nan
    params["hash"] = dict(params["hash"], static=leaf)
    trainer.state = trainer.state._replace(params=params)
    with pytest.raises(RuntimeError, match="non-finite parameters"):
        trainer._assert_params_finite()


def test_model_only_restore_from_legacy_grouped_checkpoint(setup, tmp_path):
    """ADVICE r3 (medium): epoch checkpoints written by the pre-flat-Adam
    grouped optimizer must still be loadable for params-only use — both via
    model_only and via the automatic fallback when the full-state template
    mismatches (the r3 parity ep14 checkpoint is in this format)."""
    import copy

    from lidar4d_tpu.train.optimizer import make_grouped_optimizer

    opt, ds = setup
    ws = str(tmp_path / "ws_legacy")
    field = LiDAR4DField(build_model_config(opt))
    trainer = Trainer(
        "lidar4d", opt, field, build_loss_config(opt), workspace=ws,
        lidar_metrics=[], use_checkpoint="scratch", eval_interval=100,
    )
    trainer.train_one_epoch(ds, patch_size=1)
    trainer.epoch = 3

    # write a checkpoint whose opt_state is the LEGACY grouped layout
    legacy_opt = make_grouped_optimizer(
        1e-2, 100, field.param_group_labels(trainer.state.params)
    )
    legacy_state = trainer.state._replace(
        opt_state=legacy_opt.init(trainer.state.params)
    )
    trainer.ckpt.save_epoch(
        {
            "state": legacy_state,
            "epoch": trainer.epoch,
            "global_step": trainer.global_step,
            "best_result": -1.0,
        },
        trainer.epoch,
    )

    # full-state restore falls back to params+EMA-only instead of crashing
    t2 = Trainer(
        "lidar4d", opt, field, build_loss_config(opt), workspace=ws,
        lidar_metrics=[], use_checkpoint="latest", eval_interval=100,
    )
    assert t2.epoch == 3
    assert t2.global_step == trainer.global_step
    for a, b in zip(jax.tree.leaves(trainer.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # EMA restored too (eval-path weights)
    assert int(t2.state.ema.num_updates) == int(trainer.state.ema.num_updates)

    # explicit model_only path takes the raw-graft route directly
    t3 = Trainer(
        "lidar4d", opt, field, build_loss_config(opt), workspace=ws,
        lidar_metrics=[], use_checkpoint="scratch", eval_interval=100,
    )
    t3.load_checkpoint("latest", model_only=True)
    for a, b in zip(jax.tree.leaves(trainer.state.params),
                    jax.tree.leaves(t3.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
