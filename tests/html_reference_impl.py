"""Scalar reference implementation of the html->text extraction chain.

A REGEX-FREE character walk restating the 6-step semantics documented in
convert_spark/operators/extract.py (comments -> script -> style -> tag
strip -> fixed entity set -> whitespace collapse + trim), so the engine
(Java regex), the DuckDB oracle (RE2) and this twin are three independent
restatements of one spec. Non-greedy block matching is modelled exactly:
an opener whose closer never appears matches nothing (the regex engine
fails the attempt and re-scans from opener+1), so unclosed constructs
fall through to the tag-strip step.

One documented engine/oracle divergence kept out of the corpus: Java's
ASCII \\s includes vertical tab (\\x0B), RE2's does not. This twin uses
the RE2 set; no generator emits \\x0B.
"""

from __future__ import annotations

_WORD = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_")
_WS_CLASS = " \t\r\n"  # the [ \t\r\n]+ collapse class
_BLOCK_WS = " \t\r\n\f"  # \s before the closing '>' (RE2 ASCII set)
ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def drop_comments(s: str) -> str:
    out, i = [], 0
    while True:
        j = s.find("<!--", i)
        if j < 0:
            out.append(s[i:])
            break
        k = s.find("-->", j + 4)
        if k < 0:  # unclosed: no match anywhere past here
            out.append(s[i:])
            break
        out.append(s[i:j])
        i = k + 3
    return "".join(out)


def _find_block_close(low: str, tag: str, start: int) -> int:
    """End index (exclusive) of the earliest '</tag' + \\s* + '>' at or
    after ``start``, or -1."""
    closer = "</" + tag
    m = start
    while True:
        m = low.find(closer, m)
        if m < 0:
            return -1
        k = m + len(closer)
        while k < len(low) and low[k] in _BLOCK_WS:
            k += 1
        if k < len(low) and low[k] == ">":
            return k + 1
        m += 1


def drop_blocks(s: str, tag: str) -> str:
    """Remove '<tag\\b[^>]*>...</tag\\s*>' blocks, case-insensitively."""
    low = s.lower()
    opener = "<" + tag
    out, i = [], 0
    scan = 0
    while True:
        j = low.find(opener, scan)
        if j < 0:
            break
        end_name = j + len(opener)
        if end_name < len(s) and s[end_name] in _WORD:  # \b fails
            scan = j + 1
            continue
        gt = s.find(">", end_name)
        if gt < 0:
            scan = j + 1
            continue
        close = _find_block_close(low, tag, gt + 1)
        if close < 0:  # opener without closer: attempt fails, re-scan
            scan = j + 1
            continue
        out.append(s[i:j])
        i = close
        scan = close
    out.append(s[i:])
    return "".join(out)


def strip_tags(s: str) -> str:
    out, i = [], 0
    while True:
        j = s.find("<", i)
        if j < 0:
            out.append(s[i:])
            break
        k = s.find(">", j + 1)
        if k < 0:
            out.append(s[i:])
            break
        out.append(s[i:j])
        out.append(" ")
        i = k + 1
    return "".join(out)


def decode_entities(s: str) -> str:
    for ent, ch in ENTITIES:
        s = s.replace(ent, ch)
    return s


def collapse_ws(s: str) -> str:
    out, in_ws = [], False
    for ch in s:
        if ch in _WS_CLASS:
            if not in_ws:
                out.append(" ")
            in_ws = True
        else:
            out.append(ch)
            in_ws = False
    return "".join(out).strip(" ")


def finalize(s: str) -> str:
    return collapse_ws(decode_entities(s))


def html_text(s: str) -> str:
    s = drop_comments(s)
    s = drop_blocks(s, "script")
    s = drop_blocks(s, "style")
    s = strip_tags(s)
    return finalize(s)


def html_title(s: str) -> str:
    """First '<title[^>]*>(.*?)</title\\s*>' payload (ci), finalized; ''
    when absent. NB: no \\b after 'title' in the engine pattern — the
    [^>]* absorbs trailing name characters ('<titlex y>' opens a title)."""
    low = s.lower()
    scan = 0
    while True:
        j = low.find("<title", scan)
        if j < 0:
            return ""
        gt = s.find(">", j + 6)
        if gt < 0:
            scan = j + 1
            continue
        close = _find_block_close(low, "title", gt + 1)
        if close < 0:
            scan = j + 1
            continue
        # capture ends where '</title' begins: rewind from close past '>'
        # and \s* and '</title' is fiddly; re-derive the closer start.
        m = gt + 1
        while True:
            m2 = low.find("</title", m)
            k = m2 + 7
            while k < len(low) and low[k] in _BLOCK_WS:
                k += 1
            if k < len(low) and low[k] == ">":
                return finalize(s[gt + 1 : m2])
            m = m2 + 1
