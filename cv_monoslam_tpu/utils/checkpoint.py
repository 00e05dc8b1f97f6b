"""Checkpoint / resume (SURVEY.md §5: the reference has none — its closest
artifacts are the append-only text logs and the in-memory redirection
snapshot, SLAM.cpp:1359-1378, 3512-3603).

Saves the complete run state — FilterState pytree, frame counter, config —
as a single NPZ (portable, no framework lock-in); every leaf of the pytree
round-trips exactly. ``save_checkpoint``/``load_checkpoint`` are host-side:
arrays are pulled to NumPy (one device->host transfer) and restored leaves
re-enter the device at the next jit boundary.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import numpy as np

from ..config import SlamConfig
from ..filter.state import FilterState


def save_checkpoint(path: str, state: FilterState, counter: int,
                    cfg: SlamConfig, extra: Optional[dict] = None) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["counter"] = np.asarray(counter, np.int64)
    meta = {"config": cfg.to_json(), "n_leaves": len(leaves)}
    if extra:
        meta["extra"] = extra
    payload["meta"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)                      # atomic: no torn checkpoints


def load_checkpoint(path: str) -> Tuple[FilterState, int, SlamConfig, dict]:
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        cfg = SlamConfig.from_json(meta["config"])
        leaves = [z[f"leaf_{i}"] for i in range(meta["n_leaves"])]
        counter = int(z["counter"])
    # rebuild the treedef from a fresh state of the same config
    from ..filter.state import init_state

    template = init_state(cfg)
    treedef = jax.tree_util.tree_structure(template)
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, counter, cfg, meta.get("extra", {})


def latest_checkpoint(directory: str, prefix: str = "ckpt_") -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    best, best_n = None, -1
    for name in os.listdir(directory):
        if name.startswith(prefix) and name.endswith(".npz"):
            try:
                n = int(name[len(prefix):-4])
            except ValueError:
                continue
            if n > best_n:
                best, best_n = os.path.join(directory, name), n
    return best
