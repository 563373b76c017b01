"""Snapshot-file utilities shared by the engine and the admin CLIs.

File-level only (no Spark): a snapshot is a directory holding a
``manifest.json`` (version, parent, files{rel: {size, stored}}) plus the
stored files; incremental snapshots inherit unstored files through the
parent chain (engine.snapshot writes this format — the analog of the
reference's snapshot/manager.go manifests consumed by cmd/snapshot-util
and cmd/restore-util).
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import datetime, timezone


def read_manifest(snapshot_dir: str) -> dict:
    with open(os.path.join(snapshot_dir, "manifest.json")) as f:
        return json.load(f)


def manifest_chain(snapshot_dir: str) -> list[tuple[str, dict]]:
    """[(path, manifest)] from ``snapshot_dir`` up through its parents."""
    chain: list[tuple[str, dict]] = []
    cur: str | None = snapshot_dir
    while cur is not None:
        m = read_manifest(cur)
        chain.append((cur, m))
        cur = m.get("parent")
    return chain


def list_snapshots(base_dir: str) -> list[dict]:
    """Inventory of the snapshots under ``base_dir`` (cmd/snapshot-util's
    listing): id, type (full/incremental), created at (manifest mtime,
    UTC), stored size, total logical size, parent id."""
    out = []
    if not os.path.isdir(base_dir):
        return out
    for name in sorted(os.listdir(base_dir)):
        d = os.path.join(base_dir, name)
        mf = os.path.join(d, "manifest.json")
        if not os.path.isfile(mf):
            continue
        m = read_manifest(d)
        stored = sum(e["size"] for e in m["files"].values() if e["stored"])
        total = sum(e["size"] for e in m["files"].values())
        parent = m.get("parent")
        out.append({
            "id": name,
            "type": "incremental" if parent else "full",
            "created_at": datetime.fromtimestamp(
                os.path.getmtime(mf), tz=timezone.utc
            ).strftime("%Y-%m-%d %H:%M:%S UTC"),
            "stored_bytes": stored,
            "total_bytes": total,
            "parent_id": os.path.basename(parent) if parent else "",
            "n_files": len(m["files"]),
        })
    return out


def restore_files(snapshot_dir: str, target_dir: str,
                  overwrite: bool = False) -> int:
    """Materialize a snapshot into ``target_dir`` file-by-file: each
    manifest entry comes from the nearest chain member that stores it.
    Returns the number of files written. Pure file copy — the first
    engine attach to the restored warehouse rebuilds derived state
    (catalog) if the snapshot predates it, exactly like
    ``NexusEngine.restore``. Refuses a non-empty target without
    ``overwrite`` (the reference restore-util requires a NEW data dir)."""
    if os.path.isdir(target_dir) and os.listdir(target_dir) and not overwrite:
        raise ValueError(f"target {target_dir!r} is not empty "
                         "(pass overwrite to replace)")
    chain = manifest_chain(snapshot_dir)
    top = chain[0][1]["files"]
    n = 0
    missing_catalog = False
    for rel in top:
        src = None
        for snap_path, m in chain:
            entry = m["files"].get(rel)
            if entry is not None and entry["stored"]:
                src = os.path.join(snap_path, rel)
                break
        if src is None or not os.path.isfile(src):
            if rel.split(os.sep, 1)[0] == "catalog":
                missing_catalog = True  # derived state, rebuildable
                continue
            raise ValueError(f"snapshot chain is missing {rel!r}")
        dst = os.path.join(target_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy2(src, dst)
        n += 1
    if missing_catalog:
        shutil.rmtree(os.path.join(target_dir, "catalog"),
                      ignore_errors=True)
    return n
