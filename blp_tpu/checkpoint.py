"""Checkpointing: params + optimizer state + step counters, with resume.

The reference saves only the model weights of the best epoch
(train.py:340,372-375) — training cannot resume mid-run (SURVEY.md §5.4).
Here a checkpoint carries the full training state. Format: one .npz holding
the pytree leaves in jax tree-flatten order plus path names for dict-trees
and a JSON metadata blob — no framework pickle, loadable with plain numpy.

Custom-node pytrees (e.g. optax states, which contain namedtuples) are
restored with `load_pytree(path, template=...)`, unflattening into the
template's treedef; plain dict/list trees load without a template.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _structure(tree):
    if isinstance(tree, dict):
        return {k: _structure(v) for k, v in tree.items()}
    if isinstance(tree, tuple):
        return ["__tuple__", [_structure(v) for v in tree]]
    if isinstance(tree, list):
        return ["__list__", [_structure(v) for v in tree]]
    return None


def save_pytree(path: str, tree, metadata: dict | None = None) -> None:
    tree = jax.device_get(tree)
    leaves = jax.tree.leaves(tree)
    arrays = {f"leaf_{i:05d}": np.asarray(v) for i, v in enumerate(leaves)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        structure = json.dumps(_structure(tree))
    except TypeError:
        structure = "null"
    # Extension dtypes (ml_dtypes bfloat16 et al.) survive the .npy byte
    # round-trip but come BACK as anonymous void ('V2') dtypes — record the
    # real dtype names so load_pytree can re-view them (a resumed bf16-moment
    # Adam state must not surface as un-computable raw bytes).
    dtypes = json.dumps([a.dtype.name for a in arrays.values()])
    np.savez(path, __metadata__=json.dumps(metadata or {}),
             __structure__=structure, __leaf_dtypes__=dtypes, **arrays)


def _rebuild(structure, leaves: list):
    if structure is None:
        return leaves.pop(0)
    if isinstance(structure, dict):
        return {k: _rebuild(structure[k], leaves) for k in sorted(structure)}
    kind, children = structure
    seq = [_rebuild(c, leaves) for c in children]
    return seq if kind == "__list__" else tuple(seq)


def peek_metadata(path: str) -> dict:
    """Read only the metadata blob (no leaf unflattening — usable to decide
    how to load, e.g. which param layout a train-state file was written in)."""
    with np.load(path, allow_pickle=False) as data:
        return json.loads(str(data["__metadata__"]))


def peek_num_leaves(path: str) -> int:
    """Number of stored leaves (no data read) — lets a loader distinguish
    layouts of legacy marker-less files by leaf count."""
    with np.load(path, allow_pickle=False) as data:
        return sum(1 for k in data.files if k.startswith("leaf_"))


def peek_leaf_shapes(path: str) -> list[tuple]:
    """Shapes of the stored leaves in load order, read from the .npy headers
    only (no array data) — a state file can be GBs; a layout probe must not
    load it twice. Disambiguates stacked/unstacked legacy files whose leaf
    COUNTS coincide (num_layers == 1: a stacked layer leaf is (1, ...) where
    the unstacked one is (...))."""
    import zipfile

    from numpy.lib import format as npf

    shapes = []
    with zipfile.ZipFile(path) as zf:
        for name in sorted(zf.namelist()):
            if not name.startswith("leaf_"):
                continue
            with zf.open(name) as f:
                version = npf.read_magic(f)
                shape, _, _ = npf._read_array_header(f, version)
            shapes.append(tuple(shape))
    return shapes


def _named_dtype(name: str) -> np.dtype:
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes

        return np.dtype(getattr(ml_dtypes, name))


def _restore_dtypes(leaves: list, dtype_names, template=None) -> list:
    """Re-view leaves that numpy loaded as anonymous void bytes back to the
    extension dtype they were saved with (see save_pytree). Legacy files
    without the dtype record fall back to the template leaf's dtype when the
    itemsize matches."""
    tmpl_leaves = jax.tree.leaves(template) if template is not None else None
    out = []
    for i, leaf in enumerate(leaves):
        if leaf.dtype.kind == "V":
            if dtype_names is not None:
                leaf = leaf.view(_named_dtype(dtype_names[i]))
            elif tmpl_leaves is not None:
                want = np.dtype(tmpl_leaves[i].dtype)
                if want.itemsize == leaf.dtype.itemsize:
                    leaf = leaf.view(want)
        out.append(leaf)
    return out


def load_pytree(path: str, template=None):
    """Returns (tree, metadata). With `template`, leaves are unflattened into
    the template's treedef (required for custom nodes like optax states)."""
    with np.load(path, allow_pickle=False) as data:
        metadata = json.loads(str(data["__metadata__"]))
        structure = json.loads(str(data["__structure__"]))
        dtype_names = (json.loads(str(data["__leaf_dtypes__"]))
                       if "__leaf_dtypes__" in data.files else None)
        leaves = [data[k] for k in sorted(data.files) if k.startswith("leaf_")]
    leaves = _restore_dtypes(leaves, dtype_names, template)
    if template is not None:
        treedef = jax.tree.structure(template)
        return jax.tree.unflatten(treedef, leaves), metadata
    if structure is None:
        raise ValueError(f"{path} requires a template to restore its pytree type")
    return _rebuild(structure, leaves), metadata
