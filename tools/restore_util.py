#!/usr/bin/env python3
"""restore-util CLI — materialize a snapshot into a new data directory
(the reference's cmd/restore-util/main.go: -snapshot-dir + -target-dir,
refusing a non-empty target). Pure file copy through the incremental
manifest chain, no Spark session; the first engine attach to the
restored warehouse rebuilds derived state (catalog) if needed.

    python3 tools/restore_util.py -snapshot-dir <snap> -target-dir <new_wh>
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nexusbase_spark.snapshots import restore_files  # noqa: E402


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-snapshot-dir", dest="snapshot_dir", required=True)
    p.add_argument("-target-dir", dest="target_dir", required=True)
    p.add_argument("--overwrite", action="store_true",
                   help="replace files in a non-empty target")
    args = p.parse_args(argv)
    if not os.path.isfile(os.path.join(args.snapshot_dir, "manifest.json")):
        raise SystemExit(f"error: {args.snapshot_dir!r} has no manifest.json")
    try:
        n = restore_files(args.snapshot_dir, args.target_dir,
                          overwrite=args.overwrite)
    except ValueError as e:
        raise SystemExit(f"error: {e}") from None
    print(f"restored {n} files into {args.target_dir}")


if __name__ == "__main__":
    main()
