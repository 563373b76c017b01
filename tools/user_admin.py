#!/usr/bin/env python3
"""user-admin CLI — manage the Basic-auth user file (the reference's
cmd/user-admin/main.go surface: add / list / delete over a hashed user
database; passwords prompted interactively unless --password is given
for scripting).

    python3 tools/user_admin.py add    -file users.json -username u -role reader
    python3 tools/user_admin.py list   -file users.json
    python3 tools/user_admin.py delete -file users.json -username u
"""

from __future__ import annotations

import argparse
import getpass
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nexusbase_spark.auth import (  # noqa: E402
    ROLE_READER, ROLE_WRITER, USER_FILE_MAGIC, USER_FILE_VERSION,
    hash_password,
)


def _load(path: str) -> dict:
    if not os.path.isfile(path):
        return {"magic": USER_FILE_MAGIC, "version": USER_FILE_VERSION,
                "hash_type": "sha256", "users": []}
    with open(path) as f:
        data = json.load(f)
    if data.get("magic") != USER_FILE_MAGIC:
        raise SystemExit("error: not a user database file (bad magic)")
    return data


def _save(path: str, data: dict) -> None:
    with open(path, "w") as f:
        json.dump(data, f, indent=1)


def cmd_add(args) -> None:
    if args.role not in (ROLE_READER, ROLE_WRITER):
        raise SystemExit(f"error: -role must be '{ROLE_READER}' or "
                         f"'{ROLE_WRITER}'")
    data = _load(args.file)
    if any(r["username"] == args.username for r in data["users"]):
        raise SystemExit(f"error: user {args.username!r} already exists")
    pw = args.password
    if pw is None:
        pw = getpass.getpass("Enter password: ")
        if getpass.getpass("Confirm password: ") != pw:
            raise SystemExit("error: passwords do not match")
    if not pw:
        raise SystemExit("error: empty password")
    data["users"].append({
        "username": args.username,
        "password_hash": hash_password(pw, data.get("hash_type", "sha256")),
        "role": args.role,
    })
    _save(args.file, data)
    print(f"added user {args.username!r} with role {args.role!r}")


def cmd_list(args) -> None:
    data = _load(args.file)
    if not data["users"]:
        print("no users")
        return
    print(f"{'USERNAME':20s} ROLE")
    for r in sorted(data["users"], key=lambda r: r["username"]):
        print(f"{r['username']:20s} {r['role']}")


def cmd_delete(args) -> None:
    data = _load(args.file)
    before = len(data["users"])
    data["users"] = [r for r in data["users"]
                     if r["username"] != args.username]
    if len(data["users"]) == before:
        raise SystemExit(f"error: user {args.username!r} not found")
    _save(args.file, data)
    print(f"deleted user {args.username!r}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in (("add", cmd_add), ("list", cmd_list),
                     ("delete", cmd_delete)):
        sp = sub.add_parser(name)
        sp.add_argument("-file", required=True, help="user database file")
        if name != "list":
            sp.add_argument("-username", required=True)
        if name == "add":
            sp.add_argument("-role", required=True,
                            help=f"{ROLE_READER} or {ROLE_WRITER}")
            sp.add_argument("--password",
                            help="non-interactive password (scripts/tests)")
        sp.set_defaults(fn=fn)
    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
