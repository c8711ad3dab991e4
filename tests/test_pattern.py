"""URI-embedded glob patterns: split/expand semantics mirror the
reference's unit spec (reference tests/unit/lib/test_storage_pattern.py)
and the listing over a pattern URI is exercised end-to-end."""

from __future__ import annotations

import os

from datachain_spark.sources.pattern import (
    expand_brace_pattern,
    filename_pushdown,
    glob_to_regex,
    pattern_needs_recursion,
    split_uri_pattern,
)
from datachain_spark.sources.storage import read_storage


# ---------- split_uri_pattern (reference test cases) ----------
def test_split_no_pattern():
    assert split_uri_pattern("s3://bucket/dir") == ("s3://bucket/dir", None)
    assert split_uri_pattern("s3://bucket/dir/") == ("s3://bucket/dir/", None)
    assert split_uri_pattern("file:///home/user/data") == (
        "file:///home/user/data",
        None,
    )
    assert split_uri_pattern("/local/path") == ("/local/path", None)


def test_split_wildcard():
    assert split_uri_pattern("s3://bucket/dir/*.mp3") == ("s3://bucket/dir", "*.mp3")
    assert split_uri_pattern("s3://bucket/*.txt") == ("s3://bucket", "*.txt")
    assert split_uri_pattern("file:///data/*.json") == ("file:///data", "*.json")
    assert split_uri_pattern("/local/path/*.csv") == ("/local/path", "*.csv")


def test_split_globstar():
    assert split_uri_pattern("s3://bucket/**/*.mp3") == ("s3://bucket", "**/*.mp3")
    assert split_uri_pattern("s3://bucket/dir/**/*.txt") == (
        "s3://bucket/dir",
        "**/*.txt",
    )
    assert split_uri_pattern("file:///data/**/test/*.json") == (
        "file:///data",
        "**/test/*.json",
    )


def test_split_braces_and_question():
    assert split_uri_pattern("s3://bucket/*.{mp3,wav}") == ("s3://bucket", "*.{mp3,wav}")
    assert split_uri_pattern("s3://bucket/dir/*.{jpg,png,gif}") == (
        "s3://bucket/dir",
        "*.{jpg,png,gif}",
    )
    assert split_uri_pattern("s3://bucket/file?.txt") == ("s3://bucket", "file?.txt")
    assert split_uri_pattern("file:///data/test?/file.txt") == (
        "file:///data",
        "test?/file.txt",
    )


def test_split_edge_cases():
    assert split_uri_pattern("s3://bucket/*") == ("s3://bucket", "*")
    assert split_uri_pattern("s3://bucket/**") == ("s3://bucket", "**")
    assert split_uri_pattern("s3://bucket/*/*.mp3") == ("s3://bucket", "*/*.mp3")
    assert split_uri_pattern("s3://bucket/**/test?.{mp3,wav}") == (
        "s3://bucket",
        "**/test?.{mp3,wav}",
    )
    assert split_uri_pattern("/a*/b.txt") == ("/", "a*/b.txt")


# ---------- expand_brace_pattern (reference test cases) ----------
def test_expand_lists():
    assert expand_brace_pattern("*.{mp3,wav}") == ["*.mp3", "*.wav"]
    assert expand_brace_pattern("*.{jpg,png,gif}") == ["*.jpg", "*.png", "*.gif"]
    assert expand_brace_pattern("**/*.{json,jsonl}") == ["**/*.json", "**/*.jsonl"]
    assert expand_brace_pattern("*.txt") == ["*.txt"]


def test_expand_numeric_ranges():
    assert expand_brace_pattern("file{1..3}.txt") == [
        "file1.txt",
        "file2.txt",
        "file3.txt",
    ]
    assert expand_brace_pattern("file{01..03}.txt") == [
        "file01.txt",
        "file02.txt",
        "file03.txt",
    ]
    assert expand_brace_pattern("file{3..1}.txt") == [
        "file3.txt",
        "file2.txt",
        "file1.txt",
    ]
    assert expand_brace_pattern("f{03..01}") == ["f03", "f02", "f01"]


def test_expand_char_ranges_and_cartesian():
    assert expand_brace_pattern("file{a..c}.txt") == [
        "filea.txt",
        "fileb.txt",
        "filec.txt",
    ]
    assert expand_brace_pattern("file{A..C}") == ["fileA", "fileB", "fileC"]
    assert expand_brace_pattern("file{c..a}") == ["filec", "fileb", "filea"]
    assert sorted(expand_brace_pattern("{a,b}/{c,d}")) == [
        "a/c",
        "a/d",
        "b/c",
        "b/d",
    ]


def test_expand_edge_cases():
    assert expand_brace_pattern("f{abc") == ["f{abc"]  # unmatched -> literal
    assert expand_brace_pattern("f{aa..zz}") == ["faa..zz"]  # un-range-able
    assert expand_brace_pattern("f{1..2..3}") == ["f1..2..3"]


# ---------- regex + pushdown helpers ----------
def test_glob_to_regex_semantics():
    import re

    rx = re.compile(glob_to_regex("**/*.csv"))
    assert rx.match("a.csv") and rx.match("d1/d2/a.csv")
    assert not rx.match("a.csvx") and not rx.match("a.json")
    rx = re.compile(glob_to_regex("*.csv"))
    assert rx.match("a.csv") and not rx.match("d/a.csv")  # * never crosses /
    rx = re.compile(glob_to_regex("d/**/x?.txt"))
    assert rx.match("d/x1.txt") and rx.match("d/a/b/xz.txt")
    assert not rx.match("d/x12.txt")
    rx = re.compile(glob_to_regex("file[0-2].bin"))
    assert rx.match("file1.bin") and not rx.match("file3.bin")


def test_recursion_and_pushdown():
    assert pattern_needs_recursion("**/*.csv")
    assert pattern_needs_recursion("a/b.csv")
    assert not pattern_needs_recursion("*.csv")
    assert filename_pushdown(["**/*.csv"]) == "*.csv"
    assert filename_pushdown(["**/*.csv", "**/*.json"]) is None
    assert filename_pushdown(["a/**"]) is None


# ---------- end-to-end: listing over a pattern URI ----------
def _mk_tree(tmp_path):
    for rel in [
        "x1.csv",
        "x2.csv",
        "y.json",
        "sub/x3.csv",
        "sub/deep/x4.csv",
        "sub/deep/z.txt",
    ]:
        p = tmp_path / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(rel)
    return str(tmp_path)


def test_read_storage_pattern_uri_globstar(spark, tmp_path):
    root = _mk_tree(tmp_path)
    got = sorted(
        r["path"]
        for r in read_storage(spark, os.path.join(root, "**", "x*.csv"), type="meta")
        .select("file.path")
        .collect()
    )
    assert got == ["sub/deep/x4.csv", "sub/x3.csv", "x1.csv", "x2.csv"]


def test_read_storage_pattern_uri_single_segment_is_nonrecursive(spark, tmp_path):
    root = _mk_tree(tmp_path)
    got = sorted(
        r["path"]
        for r in read_storage(spark, os.path.join(root, "*.csv"), type="meta")
        .select("file.path")
        .collect()
    )
    assert got == ["x1.csv", "x2.csv"]  # sub/ excluded: pattern has no /


def test_read_storage_pattern_uri_braces_with_content(spark, tmp_path):
    root = _mk_tree(tmp_path)
    rows = (
        read_storage(spark, os.path.join(root, "**", "*.{json,txt}"), type="text")
        .select("file.path", "text")
        .collect()
    )
    got = {r["path"]: r["text"] for r in rows}
    assert got == {"y.json": "y.json", "sub/deep/z.txt": "sub/deep/z.txt"}
