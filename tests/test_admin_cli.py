"""Admin CLI wrappers (reference cmd/user-admin, cmd/snapshot-util,
cmd/restore-util) — driven in-process via their main(argv)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from nexusbase_spark.engine import NexusEngine  # noqa: E402


def test_user_admin_roundtrip(tmp_path, capsys):
    import user_admin
    f = str(tmp_path / "users.json")
    user_admin.main(["add", "-file", f, "-username", "alice",
                     "-role", "writer", "--password", "s3cret"])
    user_admin.main(["add", "-file", f, "-username", "bob",
                     "-role", "reader", "--password", "pw"])
    user_admin.main(["list", "-file", f])
    out = capsys.readouterr().out
    assert "alice" in out and "writer" in out and "bob" in out

    # the produced file is a real auth database
    from nexusbase_spark.auth import read_user_file
    a = read_user_file(f)
    assert a.authenticate_userpass("alice", "s3cret") == "writer"

    user_admin.main(["delete", "-file", f, "-username", "bob"])
    a = read_user_file(f)
    with pytest.raises(Exception):
        a.authenticate_userpass("bob", "pw")

    with pytest.raises(SystemExit):  # duplicate add
        user_admin.main(["add", "-file", f, "-username", "alice",
                         "-role", "reader", "--password", "x"])
    with pytest.raises(SystemExit):  # bad role
        user_admin.main(["add", "-file", f, "-username", "c",
                         "-role", "admin", "--password", "x"])
    with pytest.raises(SystemExit):  # delete missing
        user_admin.main(["delete", "-file", f, "-username", "nobody"])


@pytest.mark.nightly
def test_snapshot_and_restore_utils(spark, tmp_path_factory, capsys):
    import restore_util
    import snapshot_util

    eng = NexusEngine(spark, str(tmp_path_factory.mktemp("cli_wh")))
    eng.put("m.cli", {"h": "a"}, {"v": 1.0}, ts=10)
    eng.put("m.cli", {"h": "a"}, {"v": 2.0}, ts=20)
    full = eng.snapshot()
    eng.put("m.cli", {"h": "a"}, {"v": 3.0}, ts=30)
    incr = eng.snapshot(incremental_from=full)

    base = os.path.dirname(full)
    snapshot_util.main(["-base-dir", base])
    out = capsys.readouterr().out
    assert os.path.basename(full) in out and os.path.basename(incr) in out
    assert "full" in out and "incremental" in out

    # restore the INCREMENTAL snapshot (resolves through the parent
    # chain) into a fresh dir, attach an engine, data is all there
    target = str(tmp_path_factory.mktemp("cli_restore"))
    restore_util.main(["-snapshot-dir", incr, "-target-dir", target,
                       "--overwrite"])
    out = capsys.readouterr().out
    assert "restored" in out
    eng2 = NexusEngine(spark, target)
    rows = eng2.execute("QUERY m.cli FROM 0 TO 100").collect()
    assert [r["fields"]["v"] for r in rows] == ["1.0", "2.0", "3.0"]

    # non-empty target without --overwrite refuses
    with pytest.raises(SystemExit):
        restore_util.main(["-snapshot-dir", incr, "-target-dir", target])
    # bogus snapshot dir refuses
    with pytest.raises(SystemExit):
        restore_util.main(["-snapshot-dir", str(tmp_path_factory.mktemp("x")),
                           "-target-dir", target])
