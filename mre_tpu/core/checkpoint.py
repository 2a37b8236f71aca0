"""Checkpointing: plain param pytrees on disk.

The reference stores torch ``state_dict`` blobs and has to delete
spectral-norm reparametrization keys on resume (reference: main.py:74-79,
module/submodule.py:16-21). We avoid that class of bug by checkpointing the
*plain* parameter pytree (spectral-norm power-iteration vectors live in a
separate ``state`` collection that is checkpointed alongside, not interleaved).

Format: msgpack via flax.serialization plus a JSON sidecar describing the
tree structure — readable without the model class.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tree = jax.tree_util.tree_map(np.asarray, tree)
    blob = serialization.to_bytes(tree)
    with open(path, "wb") as f:
        f.write(blob)
    meta = jax.tree_util.tree_map(lambda x: [list(x.shape), str(x.dtype)], tree)
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure of ``target`` (a template pytree)."""
    with open(path, "rb") as f:
        blob = f.read()
    return serialization.from_bytes(target, blob)


def latest_checkpoint(directory: str, prefix: str) -> str | None:
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        if name.startswith(prefix) and not name.endswith(".meta.json"):
            # parse only the LEADING digit run after the prefix: digits in a
            # model-name suffix (epoch2_v2.ckpt) must not concatenate into
            # the step and outrank a genuinely newer checkpoint
            rest = name[len(prefix):]
            i = 0
            while i < len(rest) and rest[i].isdigit():
                i += 1
            step = int(rest[:i]) if i else 0
            if step > best_step:
                best, best_step = os.path.join(directory, name), step
    return best
