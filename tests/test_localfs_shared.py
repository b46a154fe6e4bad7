"""Unit tests for the hardened scratch roots (localfs.py) and the
cross-entry shared-checkpoint memo (plans/shared.py)."""

import os
import stat

import pytest

from good_enough_timecamp_data_pipeline_spark import localfs
from good_enough_timecamp_data_pipeline_spark.plans import shared


# ---------------------------------------------------------------- localfs


def test_secure_private_root_creates_0700(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None  # force re-read of TMPDIR
    try:
        root = localfs.secure_private_root("lfs_test")
        assert os.path.isdir(root)
        assert root.startswith(str(tmp_path))
        mode = stat.S_IMODE(os.lstat(root).st_mode)
        assert mode == 0o700
        # idempotent: second call trusts the existing dir
        assert localfs.secure_private_root("lfs_test") == root
    finally:
        tempfile.tempdir = None


def test_secure_private_root_rejects_symlink(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None
    try:
        target = tmp_path / "elsewhere"
        target.mkdir()
        planted = tmp_path / f"lfs_planted-uid{os.getuid()}"
        planted.symlink_to(target)
        with pytest.raises(PermissionError, match="symlink"):
            localfs.secure_private_root("lfs_planted")
    finally:
        tempfile.tempdir = None


def test_secure_private_root_rejects_foreign_uid(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None
    try:
        real_uid = os.getuid()
        # pre-plant the directory the FAKE uid will resolve to, owned by
        # the real uid — the ownership check must then refuse it
        os.mkdir(tmp_path / f"lfs_uid-uid{real_uid + 1}", mode=0o700)
        monkeypatch.setattr(os, "getuid", lambda: real_uid + 1)
        with pytest.raises(PermissionError, match="owned by uid"):
            localfs.secure_private_root("lfs_uid")
    finally:
        tempfile.tempdir = None


def test_private_run_dir_is_unique_and_nested(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None
    try:
        a = localfs.private_run_dir("lfs_run")
        b = localfs.private_run_dir("lfs_run")
        assert a != b
        root = localfs.secure_private_root("lfs_run")
        assert os.path.dirname(a) == root and os.path.dirname(b) == root
        assert stat.S_IMODE(os.lstat(a).st_mode) == 0o700
    finally:
        tempfile.tempdir = None


# ----------------------------------------------------- shared_checkpoint


def test_shared_checkpoint_memoizes_per_tag(spark, sf_dir):
    shared.invalidate(spark)
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(5)

    a = shared.shared_checkpoint(spark, sf_dir, "t_memo", build)
    b = shared.shared_checkpoint(spark, sf_dir, "t_memo", build)
    assert calls["n"] == 1
    assert a is b
    assert a.count() == 5
    # a different tag or sf_dir is a different artifact
    shared.shared_checkpoint(spark, sf_dir, "t_memo2", build)
    shared.shared_checkpoint(spark, sf_dir + "/other", "t_memo", build)
    assert calls["n"] == 3
    shared.invalidate(spark)


def test_shared_checkpoint_survives_clearcache(spark, sf_dir):
    shared.invalidate(spark)
    df = shared.shared_checkpoint(
        spark, sf_dir, "t_clear", lambda: spark.range(7)
    )
    spark.catalog.clearCache()
    # checkpoint blocks are not catalog-cached tables; the plan must
    # still evaluate after clearCache (the bench/driver harness calls it
    # between entries)
    assert df.count() == 7
    shared.invalidate(spark)


def test_shared_checkpoint_invalidate_rebuilds(spark, sf_dir):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(3)

    shared.shared_checkpoint(spark, sf_dir, "t_inv", build)
    shared.invalidate(spark)
    shared.shared_checkpoint(spark, sf_dir, "t_inv", build)
    assert calls["n"] == 2
    shared.invalidate(spark)
