"""Gitignore-semantics `.hashignore` filter tests, mirroring the
reference's matrix (/root/reference/src/ignore_handler.rs:90-197) plus the
gitignore-spec corners the `ignore` crate covers (negation, anchoring,
globstar, classes, escapes)."""

from __future__ import annotations

import pytest

from quichash_spark.operators.hashignore import (
    hashignore_filter,
    ignored_col,
    parse_hashignore,
    should_ignore,
)


def _ign(patterns: str, path: str, is_dir: bool = False) -> bool:
    return should_ignore(parse_hashignore(patterns), path, is_dir)


def test_no_patterns():
    # ignore_handler.rs:91-105 — nothing ignored without a .hashignore
    assert not _ign("", "test.txt")
    assert not _ign("", "subdir/file.txt")


def test_basic_patterns():
    # ignore_handler.rs:107-129
    pats = "*.log\n*.tmp\ntemp/\n"
    assert _ign(pats, "test.log")
    assert _ign(pats, "file.tmp")
    assert _ign(pats, "temp", is_dir=True)
    assert not _ign(pats, "temp", is_dir=False)  # dir-only pattern
    assert not _ign(pats, "test.txt")
    assert not _ign(pats, "data.csv")


def test_negation_last_match_wins():
    # ignore_handler.rs:131-153
    pats = "*.log\n!important.log\n"
    assert _ign(pats, "test.log")
    assert _ign(pats, "debug.log")
    assert not _ign(pats, "important.log")
    # re-ignore after negation: the LAST matching rule decides
    pats2 = "*.log\n!keep*.log\nkeep_never.log\n"
    assert not _ign(pats2, "keep_this.log")
    assert _ign(pats2, "keep_never.log")


def test_comments_and_blanks():
    # ignore_handler.rs:155-176
    pats = "# This is a comment\n*.log\n\n# Another comment\n*.tmp\n"
    assert _ign(pats, "test.log")
    assert _ign(pats, "file.tmp")
    assert not _ign(pats, "test.txt")
    # escaped leading '#' is a literal pattern
    assert _ign("\\#header.txt", "#header.txt")


def test_subdirectories():
    # ignore_handler.rs:178-197
    pats = "build/\nnode_modules/\n*.o\n"
    assert _ign(pats, "build", is_dir=True)
    assert _ign(pats, "node_modules", is_dir=True)
    assert _ign(pats, "src/main.o")  # no-slash pattern matches at depth
    assert not _ign(pats, "src", is_dir=True)
    assert not _ign(pats, "src/main.c")


def test_anchoring():
    # a pattern containing '/' is anchored to the root
    pats = "docs/*.md\n/topfile\n"
    assert _ign(pats, "docs/readme.md")
    assert not _ign(pats, "sub/docs/readme.md")
    assert _ign(pats, "topfile")
    assert not _ign(pats, "sub/topfile")


def test_globstar_and_classes():
    pats = "data/**/cache\n**/vendor\nlog?[0-9].txt\n"
    assert _ign(pats, "data/cache")
    assert _ign(pats, "data/a/b/cache")
    assert _ign(pats, "vendor")
    assert _ign(pats, "x/y/vendor")
    assert _ign(pats, "loga1.txt")
    assert not _ign(pats, "logaa.txt")
    assert not _ign(pats, "data/cachex")


def test_star_does_not_cross_separator():
    assert _ign("*.log", "a.log")
    assert _ign("*.log", "dir/a.log")  # basename match at depth
    assert not _ign("src*.c", "src/x.c")  # '*' must not match '/'


@pytest.mark.usefixtures("spark")
def test_spark_filter_matches_python(spark):
    """The JVM rlike fold must agree with the pure-Python twin row-for-row."""
    from pyspark.sql import functions as F

    pats = "*.log\n!keep*.log\nbuild/\ndata/**/cache\n/top_secret*\n"
    rules = parse_hashignore(pats)
    paths = [
        ("a.log", False), ("keep_a.log", False), ("x/deep.log", False),
        ("build", True), ("build", False), ("src/build", True),
        ("data/a/cache", False), ("data/cache", False), ("datax/cache", False),
        ("top_secret_1", False), ("sub/top_secret_1", False), ("src/m.c", False),
    ]
    df = spark.createDataFrame(paths, "path string, is_dir boolean").withColumn(
        "ignored", ignored_col(rules, F.col("path"), F.col("is_dir"))
    )
    got = {(r["path"], r["is_dir"]): r["ignored"] for r in df.collect()}
    for p, d in paths:
        assert got[(p, d)] == should_ignore(rules, p, d), (p, d)
    kept = hashignore_filter(
        spark.createDataFrame(paths, "path string, is_dir boolean"),
        pats,
        is_dir_col="is_dir",
    )
    expect_kept = sum(1 for p, d in paths if not should_ignore(rules, p, d))
    assert kept.count() == expect_kept
