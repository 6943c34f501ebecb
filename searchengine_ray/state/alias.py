"""Serving alias: a one-line JSON pointer to the live index directory,
swapped ATOMICALLY (tmp + rename) — the blue/green deploy primitive
that makes the index lifecycle (build → merge_indexes / delete_docs →
swap) operational. A Searcher opened on an alias resolves it ONCE at
construction and pins that index — in-flight searchers keep serving
the old index until they are recycled, which is exactly the isolation
a rolling swap wants."""

from __future__ import annotations

import json
import os


def set_alias(alias_path: str, index_dir: str) -> None:
    """Point ``alias_path`` at ``index_dir`` atomically; the target
    must already hold a manifest (refuse to publish a half-built
    index)."""
    from searchengine_ray.build.pipeline import MANIFEST_NAME

    if not os.path.exists(os.path.join(index_dir, MANIFEST_NAME)):
        raise ValueError(
            f"{index_dir} holds no index manifest — refusing to point "
            "the alias at it")
    tmp = alias_path + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"index_dir": os.path.abspath(index_dir)}, f)
    os.replace(tmp, alias_path)


def resolve_alias(path: str) -> str:
    """A regular index DIRECTORY passes through; an alias FILE resolves
    to its index_dir (one level only — an alias may not point at
    another alias)."""
    if not os.path.isfile(path):
        return path
    with open(path) as f:
        target = json.load(f)["index_dir"]
    if os.path.isfile(target):
        raise ValueError(f"alias {path} points at another alias "
                         f"({target}); chains are not allowed")
    return target
