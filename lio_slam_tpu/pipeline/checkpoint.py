"""Checkpoint / resume of the full SLAM state.

The reference has NO mid-run checkpointing — persistence is only the PCD
export service, and resume/relocalization is a stub (`common_lib::remapping`
returns -1, `lib/common_lib.cpp:38-43`; "TODO remapping"
`mapOptmization.cpp:443-447`).  Here the whole `LioState` (+ IMU front-end
state) is one pytree of fixed-shape arrays, so checkpointing is a flat
save/restore — making mission pause/resume and crash recovery first-class
(SURVEY.md §5).

Format: a single .npz with flattened leaf arrays + a small JSON manifest of
the tree structure (no pickle; robust across sessions).
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax

from lio_slam_tpu.config import Config
from lio_slam_tpu.pipeline import imu_frontend as fe
from lio_slam_tpu.pipeline import lio

# v2: LioState grew `evict_count` (keyframe-capacity eviction counter) —
# leaves are stored positionally, so the layout is versioned
FORMAT_VERSION = 2


def _flatten_with_paths(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    paths = [f"leaf_{i:04d}" for i in range(len(leaves))]
    return leaves, paths, treedef


def save_checkpoint(path: str, state: lio.LioState,
                    imu_state: fe.ImuFrontendState | None = None,
                    metadata: dict | None = None) -> None:
    leaves, paths, _ = _flatten_with_paths(state)
    arrays = {p: np.asarray(l) for p, l in zip(paths, leaves)}
    n_lio = len(leaves)
    n_imu = 0
    if imu_state is not None:
        ileaves, ipaths, _ = _flatten_with_paths(imu_state)
        for p, l in zip(ipaths, ileaves):
            arrays[f"imu_{p}"] = np.asarray(l)
        n_imu = len(ileaves)
    manifest = {
        "format_version": FORMAT_VERSION,
        "n_lio_leaves": n_lio,
        "n_imu_leaves": n_imu,
        "metadata": metadata or {},
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, __manifest__=json.dumps(manifest), **arrays)
    os.replace(tmp, path)          # atomic


def load_checkpoint(path: str, cfg: Config, ops=None):
    """Returns (lio_state, imu_state | None, metadata).

    The archive's leaves are grafted onto freshly-built states for `cfg`, so
    shapes are validated leaf-by-leaf (a capacity mismatch raises with the
    offending leaf named).
    """
    with np.load(path, allow_pickle=False) as z:
        manifest = json.loads(str(z["__manifest__"]))
        if manifest["format_version"] != FORMAT_VERSION:
            raise ValueError(f"checkpoint format {manifest['format_version']} "
                             f"!= supported {FORMAT_VERSION}")
        template = lio.init_state(cfg, ops=ops)
        leaves, _, treedef = _flatten_with_paths(template)
        new_leaves = []
        for i, tmpl in enumerate(leaves):
            arr = z[f"leaf_{i:04d}"]
            if arr.shape != tmpl.shape:
                raise ValueError(
                    f"checkpoint leaf {i} shape {arr.shape} != config shape "
                    f"{tmpl.shape} — was the checkpoint written with a "
                    f"different StaticConfig?")
            new_leaves.append(arr.astype(np.asarray(tmpl).dtype))
        state = jax.tree_util.tree_unflatten(treedef, new_leaves)

        imu_state = None
        if manifest["n_imu_leaves"]:
            itmpl = fe.init_state()
            ileaves, _, itreedef = _flatten_with_paths(itmpl)
            new_ileaves = [z[f"imu_leaf_{i:04d}"].astype(np.asarray(t).dtype)
                           for i, t in enumerate(ileaves)]
            imu_state = jax.tree_util.tree_unflatten(itreedef, new_ileaves)
    return state, imu_state, manifest["metadata"]
