#!/usr/bin/env python3
"""snapshot-util CLI — list the snapshots under a base directory (the
reference's cmd/snapshot-util/main.go table: ID, TYPE, CREATED AT,
SIZE, PARENT). Pure file inspection, no Spark session.

    python3 tools/snapshot_util.py -base-dir <warehouse>/snapshots
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nexusbase_spark.snapshots import list_snapshots  # noqa: E402


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-base-dir", dest="base_dir", required=True,
                   help="directory containing the snapshot directories")
    args = p.parse_args(argv)
    snaps = list_snapshots(args.base_dir)
    if not snaps:
        print("No snapshots found.")
        return
    hdr = f"{'ID':14s} {'TYPE':12s} {'CREATED AT':24s} " \
          f"{'STORED (MB)':>12s} {'TOTAL (MB)':>11s} {'FILES':>6s}  PARENT ID"
    print(hdr)
    print("-" * len(hdr))
    for s in snaps:
        print(f"{s['id']:14s} {s['type']:12s} {s['created_at']:24s} "
              f"{s['stored_bytes'] / 2**20:12.2f} "
              f"{s['total_bytes'] / 2**20:11.2f} {s['n_files']:6d}  "
              f"{s['parent_id']}")


if __name__ == "__main__":
    main()
