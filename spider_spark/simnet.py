"""Deterministic synthetic web — the stand-in for the network.

Every test and benchmark "fetch" is a pure function of the URL, so crawl
runs are bit-for-bit replayable (SURVEY.md §7 hard-part (c)).  This mirrors
the reference's captured-response fixtures under /root/reference/html/
(e.g. html/person_unicom/called_info.html) which let its parsers run
without the network, and the fixed status-code taxonomy of
share_func.py:291-304 / shixin_spider.py:140-153.

URL space: ``http://h{H}.example/p{P}`` for host id H in [0, n_hosts) and
page id P in [0, page_space).  The page graph, status mix, and span bodies
are all arithmetic on (H, P):

- ~4% retryable server error (status 529, err_type 1),
  ~1% timeout (status 408, err_type 2),
  ~1% permanent not-found (status 404, err_type 3), rest 200 —
  matching the reference's observed error mix knobs (FIXTURES.md §3).
- 200 pages carry 0–3 outlinks plus interleaved title/text/media spans
  with strictly increasing offsets (the per-row invariant).

Two implementations share the same arithmetic: scalar (used by the pure-
Python reference simulator ``refsim.py``) and numpy-vectorized (used by
the Spark fetch stage inside mapInPandas — no per-row Python on the hot
fields).
"""

from __future__ import annotations

import numpy as np

MASK31 = 0x7FFFFFFF
ERR_REQUEST, ERR_TIMEOUT, ERR_UNKNOWN = 1, 2, 3


def url_of(host_id: int, page_id: int) -> str:
    return f"http://h{host_id}.example/p{page_id}"


def host_of(host_id: int) -> str:
    return f"h{host_id}.example"


def page_key(h, p):
    """Deterministic per-page key; works on ints and numpy arrays."""
    return (h * 1_000_003 + p * 7_919 + 12_345) & MASK31


def status_of_key(k):
    """Works on ints; see status_of_key_np for the vectorized twin."""
    m = k % 1000
    if m < 40:
        return 529
    if m < 50:
        return 408
    if m < 60:
        return 404
    return 200


def err_type_of_status(s: int) -> int:
    if s == 200:
        return 0
    if s == 529:
        return ERR_REQUEST
    if s == 408:
        return ERR_TIMEOUT
    return ERR_UNKNOWN


def status_of_key_np(k: np.ndarray) -> np.ndarray:
    m = k % 1000
    out = np.full(k.shape, 200, dtype=np.int32)
    out[m < 60] = 404
    out[m < 50] = 408
    out[m < 40] = 529
    return out


def n_links_of_key(k):
    return (k >> 8) % 4


def link_target(h: int, p: int, j: int, n_hosts: int, page_space: int) -> tuple[int, int]:
    """j-th outlink of page (h, p) -> (host_id, page_id)."""
    k = page_key(h, p)
    th = (h + 1 + ((k >> (4 * j)) % 7)) % n_hosts
    tp = (p * 31 + j * 13 + h + 1) % page_space
    return th, tp


WORDS = (
    "the data spark crawl frontier queue host page link fetch parse span "
    "merge shuffle filter bloom hash table row batch round seed depth"
).split()


def _words_of_key(k: int, n: int) -> str:
    return " ".join(WORDS[(k >> (i * 3)) % len(WORDS)] for i in range(n))


def spans_of(h: int, p: int, n_hosts: int, page_space: int) -> list[dict]:
    """Interleaved span body of a 200 page (input_hint shape).

    kind ∈ {title, text, link, media}; offsets strictly increasing;
    media spans carry media_ref and empty text, link spans carry the
    target URL in text (FIXTURES.md §2).
    """
    k = page_key(h, p)
    spans = [
        {"kind": "title", "text": f"Page {h}/{p}", "media_ref": "", "offset": 0},
        {"kind": "text", "text": _words_of_key(k, 5 + k % 4), "media_ref": "", "offset": 1},
    ]
    off = 2
    if k % 3 == 0:
        spans.append(
            {"kind": "media", "text": "", "media_ref": f"media://h{h}/p{p}/img0", "offset": off}
        )
        off += 1
    if k % 5 == 0:
        spans.append(
            {"kind": "text", "text": _words_of_key(k >> 7, 4), "media_ref": "", "offset": off}
        )
        off += 1
    for j in range(n_links_of_key(k)):
        th, tp = link_target(h, p, j, n_hosts, page_space)
        spans.append({"kind": "link", "text": url_of(th, tp), "media_ref": "", "offset": off})
        off += 1
    return spans


def fetch_one(h: int, p: int, n_hosts: int, page_space: int) -> tuple[int, int, list[dict]]:
    """(status, err_type, spans) — the scalar 'network'."""
    k = page_key(h, p)
    s = status_of_key(k)
    if s != 200:
        return s, err_type_of_status(s), []
    return s, 0, spans_of(h, p, n_hosts, page_space)


def parse_url_np(urls) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized `http://h{H}.example/p{P}` -> (H, P) int64 arrays.

    Uses pandas C-level str ops (no per-row Python).
    """
    import pandas as pd

    s = pd.Series(urls, dtype="string")
    ext = s.str.extract(r"^http://h(\d+)\.example/p(\d+)$")
    h = pd.to_numeric(ext[0], errors="coerce").fillna(-1).astype("int64").to_numpy()
    p = pd.to_numeric(ext[1], errors="coerce").fillna(-1).astype("int64").to_numpy()
    return h, p
