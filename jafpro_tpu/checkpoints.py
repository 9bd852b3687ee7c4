"""Orbax checkpointing, keyed by the reference's per-module names.

The reference writes per-module ``state_dict`` files
``{Accu,inpaint,bg,refine,pro,D,FD}_iter_<N>.pth`` every save interval
(``train/4.convLSTM_flowpro_interval.py:514-533``) and never checkpoints
optimizer state.  Here one orbax checkpoint holds the same module keys plus
optimizer state and the step counter (an improvement the survey calls for),
with per-module export retained for parity testing.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save_checkpoint(ckpt_dir: str, step: int, state: Dict[str, Any]) -> str:
    """state: {'params': {...per-module...}, 'opt_state': ..., ...}."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"iter_{step}")
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
    else:  # numpy fallback
        os.makedirs(path, exist_ok=True)
        flat, treedef = jax.tree_util.tree_flatten(state)
        np.savez(os.path.join(path, "state.npz"),
                 *[np.asarray(x) for x in flat])
        with open(os.path.join(path, "treedef.txt"), "w") as f:
            f.write(str(treedef))
    return path


def restore_checkpoint(
    ckpt_dir: str, step: int, target: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    """Restore ``iter_<step>``.  With ``target=None`` the checkpoint is
    restored as saved (raw nested dict) — the inference path uses this so it
    never has to reconstruct the trainer's optimizer tree (the round-1
    save/restore asymmetry: train saves {params, opt_states, step} while
    infer only wants params)."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"iter_{step}")
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path) if target is None else \
            ckptr.restore(path, target)
    if target is None:
        raise ValueError(
            "restore_checkpoint(target=None) requires orbax (the numpy "
            "fallback stores no tree structure)")
    flat, treedef = jax.tree_util.tree_flatten(target)
    data = np.load(os.path.join(path, "state.npz"))
    restored = [data[k] for k in data.files]
    return jax.tree_util.tree_unflatten(treedef, restored)


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("iter_"):
            try:
                steps.append(int(name.split("_")[1]))
            except ValueError:
                pass
    return max(steps) if steps else None
