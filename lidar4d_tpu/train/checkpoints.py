"""Checkpointing with orbax: latest / best / refine semantics.

Parity with the reference's `Trainer.save_checkpoint/load_checkpoint`
(`model/runner.py:955-1073`):
  * per-epoch full checkpoint `{name}_ep{NNNN}` (params, opt_state, ema,
    epoch, global_step, stats), keep `max_keep` (default 1), delete old;
  * "best" checkpoint `{name}_best` written when the tracked stat (CD)
    improves, storing the EMA weights snapshot (runner.py:987-1008);
  * "latest" resolution by sorted directory names (runner.py:1014-1019);
  * refine stage writes `{name}_ep{NNNN}_refine` with model-only state.
"""

import glob
import os
import shutil

import jax
import numpy as np
import orbax.checkpoint as ocp


def _restore_args(tree):
    # Restore to HOST numpy: materializing jax.Arrays straight onto the
    # device (StandardCheckpointer + ShapeDtypeStruct) deadlocks on the
    # tunneled single-chip backend; host restore is also what the trainer
    # wants (arrays are transferred lazily on first jit call).
    return jax.tree.map(lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)


class CheckpointManager:
    def __init__(self, workspace, name="lidar4d", max_keep=1):
        self.ckpt_dir = os.path.abspath(os.path.join(workspace, "checkpoints"))
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.name = name
        self.max_keep = max_keep
        self._history = []

    # ------------------------------------------------------------------ save
    def save_epoch(self, state_tree, epoch, remove_old=True):
        path = os.path.join(self.ckpt_dir, f"{self.name}_ep{epoch:04d}")
        self._save(path, state_tree)
        if remove_old:
            self._history.append(path)
            while len(self._history) > self.max_keep:
                old = self._history.pop(0)
                if os.path.exists(old):
                    shutil.rmtree(old, ignore_errors=True)
        return path

    def save_best(self, state_tree):
        path = os.path.join(self.ckpt_dir, f"{self.name}_best")
        self._save(path, state_tree)
        return path

    def save_refine(self, state_tree, epoch):
        path = os.path.join(self.ckpt_dir, f"{self.name}_ep{epoch:04d}_refine")
        self._save(path, state_tree)
        return path

    def _save(self, path, tree):
        if os.path.exists(path):
            shutil.rmtree(path, ignore_errors=True)
        # device arrays -> host before handing to orbax (same tunnel caveat)
        tree = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)
        with ocp.PyTreeCheckpointer() as ck:
            ck.save(path, tree)

    # ------------------------------------------------------------------ load
    def latest_path(self, include_refine=False):
        pattern = f"{self.ckpt_dir}/{self.name}_ep*"
        # Skip in-flight orbax saves ("*.orbax-checkpoint-tmp"): a concurrent
        # or killed writer leaves them behind, and restoring one raises
        # "Found incomplete checkpoint".
        paths = sorted(
            p for p in glob.glob(pattern) if ".orbax-checkpoint-tmp" not in p
        )
        if not include_refine:
            paths = [p for p in paths if not p.endswith("_refine")]
        return paths[-1] if paths else None

    def best_path(self):
        p = os.path.join(self.ckpt_dir, f"{self.name}_best")
        return p if os.path.exists(p) else None

    def restore(self, path, template_tree):
        try:
            with ocp.PyTreeCheckpointer() as ck:
                return ck.restore(
                    os.path.abspath(path),
                    item=template_tree,
                    restore_args=_restore_args(template_tree),
                )
        except ValueError as e:
            raise ValueError(
                f"checkpoint {path} does not match the current train-state "
                "structure. Checkpoints written before the flat-Adam "
                "optimizer (PERF.md r3) store per-leaf optax state and "
                "cannot be resumed; re-train or load params-only via "
                "ema/params trees."
            ) from e

    def resolve(self, which, include_refine=False):
        """'latest' | 'best' | explicit path -> path or None."""
        if which in ("latest", "latest_model"):
            return self.latest_path(include_refine=include_refine)
        if which == "best":
            return self.best_path() or self.latest_path()
        if which == "scratch":
            return None
        return which if os.path.exists(which) else None
