"""URI-embedded glob patterns for read_storage.

The reference splits `s3://bucket/**/x*.csv` into a listable base and a
glob pattern automatically (reference src/datachain/lib/dc/
storage_pattern.py:35-118; behavior spec = its unit tests,
tests/unit/lib/test_storage_pattern.py), so the user's first line
`read_storage("dir/**/*.csv")` just works — no explicit `glob=`.

Spark-first realization (consumed by sources/storage.py read_storage):
- brace alternations/ranges expand driver-side (pure metadata, O(variants));
- the listing walks only the BASE, and non-recursively when the pattern
  stays within one path segment (the reference's should_use_recursion);
- the final path component is pushed down as Spark's `pathGlobFilter`
  when unambiguous, so executors skip non-matching files DURING the walk;
- the full pattern is enforced as one codegen `rlike` on the file's
  relative path (glob -> anchored regex below): `*`/`?` never cross `/`,
  `**` spans any number of directories.
"""

from __future__ import annotations

import re

# characters that make a URI "patterned" (same set the reference probes)
_PATTERN_CHARS = "*?[{}"
# characters that make one path SEGMENT a pattern start: fnmatch magic
# (*, ?, [) or a brace alternation
_SEGMENT_MAGIC = re.compile(r"[*?\[{]")


def has_pattern(uri: str) -> bool:
    return any(c in uri for c in _PATTERN_CHARS)


def split_uri_pattern(uri: str) -> tuple[str, str | None]:
    """Split a URI at its first patterned path segment: returns
    (listable base, glob pattern relative to it), or (uri, None) when the
    URI carries no pattern. `s3://b/dir/**/*.csv` -> (`s3://b/dir`,
    `**/*.csv`); `/data/*.csv` -> (`/data`, `*.csv`)."""
    if not has_pattern(uri):
        return uri, None
    scheme = ""
    rest = uri
    if "://" in uri:
        head, _, rest = uri.partition("://")
        scheme = head + "://"
    segs = rest.split("/")
    first = next((i for i, s in enumerate(segs) if _SEGMENT_MAGIC.search(s)), None)
    if first is None:
        return uri, None
    if scheme:
        if first == 0:
            # the authority itself is patterned (only meaningful for
            # non-cloud schemes); everything after it is the pattern
            return scheme + segs[0], "/".join(segs[1:]) or "*"
        return scheme + "/".join(segs[:first]), "/".join(segs[first:])
    base = "/".join(segs[:first]) if first > 0 else "/"
    return (base or "/"), "/".join(segs[first:])


def pattern_needs_recursion(pattern: str) -> bool:
    """A pattern confined to one path segment matches direct children only
    (list non-recursively); `**` or an embedded `/` spans directories."""
    return "**" in pattern or "/" in pattern


# ---------- brace expansion ----------
def expand_brace_pattern(pattern: str) -> list[str]:
    """Expand `{a,b}` alternations, `{1..5}` / `{01..10}` numeric ranges
    (zero-padded iff a bound is), and `{a..z}` single-char ranges, in every
    combination. Unmatched or un-range-able braces stay literal."""
    start = pattern.find("{")
    if start == -1:
        return [pattern]
    depth, end = 0, -1
    for i in range(start, len(pattern)):
        if pattern[i] == "{":
            depth += 1
        elif pattern[i] == "}":
            depth -= 1
            if depth == 0:
                end = i
                break
    if end == -1:
        return [pattern]  # unmatched '{' is literal
    head, body, tail = pattern[:start], pattern[start + 1 : end], pattern[end + 1 :]
    if ".." in body:
        options = _range_options(body)
    else:
        options = [o.strip() for o in body.split(",")]
    out: list[str] = []
    for o in options:
        out.extend(expand_brace_pattern(head + o + tail))
    return out


def _range_options(spec: str) -> list[str]:
    bounds = spec.split("..")
    if len(bounds) != 2:
        return [spec]
    lo, hi = bounds
    if lo.isdigit() and hi.isdigit():
        pad = max(len(lo), len(hi)) if (lo.startswith("0") or hi.startswith("0")) else 0
        a, b = int(lo), int(hi)
        step = 1 if a <= b else -1
        nums = range(a, b + step, step)
        return [str(n).zfill(pad) if pad else str(n) for n in nums]
    if len(lo) == 1 == len(hi) and lo.isalpha() and hi.isalpha():
        a, b = ord(lo), ord(hi)
        step = 1 if a <= b else -1
        return [chr(c) for c in range(a, b + step, step)]
    return [spec]


# ---------- glob -> anchored regex over the relative path ----------
def glob_to_regex(pattern: str) -> str:
    """One glob variant (braces already expanded) to an anchored regex:
    `*` -> [^/]*, `?` -> [^/], `[...]`/`[!...]` character classes, a bare
    `**` segment -> zero or more whole directories (`.*` when trailing)."""
    segs = pattern.split("/")
    rx = ""
    for idx, seg in enumerate(segs):
        last = idx == len(segs) - 1
        if seg == "**":
            rx += ".*" if last else "(?:[^/]+/)*"
        else:
            rx += _segment_regex(seg) + ("" if last else "/")
    return "^" + rx + "$"


def globs_to_regex(variants: list[str]) -> str:
    if len(variants) == 1:
        return glob_to_regex(variants[0])
    return "^(?:" + "|".join(glob_to_regex(v)[1:-1] for v in variants) + ")$"


def _segment_regex(seg: str) -> str:
    rx: list[str] = []
    i = 0
    while i < len(seg):
        c = seg[i]
        if c == "*":
            rx.append("[^/]*")
        elif c == "?":
            rx.append("[^/]")
        elif c == "[":
            j = _class_end(seg, i)
            if j == -1:
                rx.append(re.escape(c))
            else:
                body = seg[i + 1 : j]
                if body.startswith("!"):
                    body = "^" + body[1:]
                rx.append("[" + body + "]")
                i = j
        else:
            rx.append(re.escape(c))
        i += 1
    return "".join(rx)


def _class_end(seg: str, start: int) -> int:
    """Index of the `]` closing the class opened at `start`, honoring the
    fnmatch rule that a leading `]` (possibly after `!`) is literal."""
    i = start + 1
    if i < len(seg) and seg[i] in "!^":
        i += 1
    if i < len(seg) and seg[i] == "]":
        i += 1
    while i < len(seg):
        if seg[i] == "]":
            return i
        i += 1
    return -1


def filename_pushdown(variants: list[str]) -> str | None:
    """The single unambiguous final-component glob shared by every variant
    (Spark's pathGlobFilter prunes the walk with it), or None when the
    variants disagree or the tail is itself a `**`."""
    tails = {v.rsplit("/", 1)[-1] for v in variants}
    if len(tails) != 1:
        return None
    tail = next(iter(tails))
    if not tail or "**" in tail or "{" in tail:
        return None
    return tail
