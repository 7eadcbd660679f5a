"""Checkpoint management with the reference's save/restore policy.

Re-design of /root/reference/train.py:370-397 and utils.py:102-166:
- three tracked checkpoints (latest / best_vloss / best_dice) + periodic
  epoch backups every backup_interval;
- resume restores params + optimizer state + epoch + best metrics;
- pretrained-weight surgery: non-strict restore copying only intersecting
  param paths with matching shapes (torch load_state_dict(strict=False)
  equivalent, utils.py:122-139).

Storage: orbax StandardCheckpointer over a directory tree
  <dir>/latest, <dir>/best_vloss, <dir>/best_dice, <dir>/backups/epoch<N>.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, out_dir: str, backup_interval: int = 5):
        self.out_dir = os.path.abspath(out_dir)
        self.backup_interval = backup_interval
        os.makedirs(os.path.join(self.out_dir, "backups"), exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    # ---------- paths ----------
    def _path(self, name: str) -> str:
        return os.path.join(self.out_dir, name)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.out_dir, f"{name}.meta.json")

    # ---------- save ----------
    def _save(self, name: str, state, meta: Dict[str, Any]):
        path = self._path(name)
        self._ckpt.save(path, state, force=True)
        # StandardCheckpointer saves asynchronously; wait so 'latest' is never
        # half-written when the process exits or the next epoch overwrites it
        self._ckpt.wait_until_finished()
        with open(self._meta_path(name), "w") as f:
            json.dump(meta, f)

    def save_epoch(self, state, epoch: int, vloss: Optional[float],
                   dice: Optional[float], best_vloss: float,
                   best_dice: float) -> Tuple[float, float]:
        """Apply the reference's policy: always save latest; save best_vloss /
        best_dice on improvement; periodic backup. Returns updated bests.

        Pass vloss/dice as None on epochs where validation did not run
        (--validate_every > 1): latest/backup are still written but the
        best trackers are untouched — a zero-filled metric must never
        clobber best_vloss/best_dice."""
        validated = vloss is not None and dice is not None
        meta = dict(epoch=epoch,
                    vloss=float(vloss) if validated else None,
                    dice=float(dice) if validated else None,
                    best_vloss=float(best_vloss), best_dice=float(best_dice))
        if epoch % self.backup_interval == 0:
            self._save(os.path.join("backups", f"epoch{epoch}"), state, meta)
        if validated and vloss < best_vloss:
            best_vloss = float(vloss)
            meta["best_vloss"] = best_vloss
            self._save("best_vloss", state, meta)
        if validated and dice > best_dice:
            best_dice = float(dice)
            meta["best_dice"] = best_dice
            self._save("best_dice", state, meta)
        meta["best_vloss"], meta["best_dice"] = best_vloss, best_dice
        self._save("latest", state, meta)
        return best_vloss, best_dice

    # ---------- restore ----------
    def exists(self, name: str = "latest") -> bool:
        return os.path.isdir(self._path(name))

    def restore_raw(self, name: str) -> Tuple[Any, Dict[str, Any]]:
        """Restore without a template: returns the checkpoint's own pytree
        (a dict of the saved state's fields). This is the right entry point
        for pretrained-weight surgery, where the donor's param tree differs
        from the target's (e.g. pretrain nets built with shared_recon=False
        lack the flagship's rfinal_* heads) — a templated restore would
        fail strict tree matching before `surgical_restore` ever runs."""
        state = self._ckpt.restore(self._path(name))
        meta: Dict[str, Any] = {}
        if os.path.exists(self._meta_path(name)):
            with open(self._meta_path(name)) as f:
                meta = json.load(f)
        return state, meta

    def restore(self, name: str, template) -> Tuple[Any, Dict[str, Any]]:
        state = self._ckpt.restore(self._path(name), template)
        meta: Dict[str, Any] = {}
        if os.path.exists(self._meta_path(name)):
            with open(self._meta_path(name)) as f:
                meta = json.load(f)
        return state, meta

    def load_or_initialize(self, state, name: str = "latest"):
        """Resume semantics of utils.py:102-152: (state, epoch_start,
        best_vloss, best_dice)."""
        if not self.exists(name):
            return state, 1, float("inf"), 0.0
        restored, meta = self.restore(name, state)
        return (restored, int(meta.get("epoch", 0)) + 1,
                float(meta.get("best_vloss", float("inf"))),
                float(meta.get("best_dice", 0.0)))


def surgical_restore(target_params, donor_params, verbose: bool = False):
    """Copy every leaf whose path exists in both trees with a matching shape
    (non-strict pretrained-weight load, utils.py:122-139). Returns
    (merged_params, loaded_paths, skipped_paths)."""
    t_flat = dict(jax.tree_util.tree_flatten_with_path(target_params)[0])
    d_flat = dict(jax.tree_util.tree_flatten_with_path(donor_params)[0])
    loaded, skipped = [], []
    merged = dict(t_flat)
    for path, leaf in t_flat.items():
        key = jax.tree_util.keystr(path)
        if path in d_flat and np.shape(d_flat[path]) == np.shape(leaf):
            merged[path] = d_flat[path]
            loaded.append(key)
        else:
            skipped.append(key)
    treedef = jax.tree_util.tree_structure(target_params)
    ordered = [merged[p] for p, _ in
               jax.tree_util.tree_flatten_with_path(target_params)[0]]
    out = jax.tree_util.tree_unflatten(treedef, ordered)
    if verbose:
        print(f"surgical_restore: loaded {len(loaded)}, "
              f"skipped {len(skipped)}")
    return out, loaded, skipped
