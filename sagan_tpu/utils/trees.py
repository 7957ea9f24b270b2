"""Canonical pytree variable-path naming.

One definition of the "G/up32_bn/scale"-style path strings used
everywhere a variable is named — the startup variable dump, TB
per-variable scalars/histograms, and the exported generator npz keys —
so archives and logs always agree on names.
"""

from __future__ import annotations

import jax


def flatten_with_paths(tree):
    """(path_strings, leaves, treedef) for a pytree."""
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    keys = ["/".join(str(getattr(k, "key", k)) for k in path)
            for path, _leaf in leaves]
    return keys, [leaf for _p, leaf in leaves], treedef


def tree_paths(tree) -> list:
    return flatten_with_paths(tree)[0]
