"""Real HTTP transport with the reference's typed retry ladder (S1).

The engine's default fetcher is the deterministic simnet
(``fetch.make_fetch_fn``) — this sandbox has no network, and every
correctness gate (crawl parity, span equality) needs replayable pages.
This module ships the REAL transport variant the reference actually runs
(``basicRequest``, flask_spider/spider/public/share_func.py:103-171),
re-expressed as an injectable, testable ladder:

    exception class        reference reaction           here
    ------------------     --------------------------   -----------------------------
    ConnectTimeout /       sleep, timeout += 1, retry    backoff sleep, timeout += 1,
    ReadTimeout / Timeout                                retry; exhausted -> ERR_TIMEOUT
    ProxyError             drop proxies, retry           drop proxy, retry;
                                                         exhausted -> ERR_REQUEST
    SSLError               verify = False, retry         verify=False, retry;
                                                         exhausted -> ERR_REQUEST
    other RequestException sleep, retry                  backoff sleep, retry;
                                                         exhausted -> ERR_UNKNOWN

plus HTTP-status mapping the reference leaves implicit (it checks
``response`` truthiness): 2xx -> ok, 5xx/429/408 -> ERR_REQUEST or
ERR_TIMEOUT (retryable — the frontier state machine re-schedules them
with backoff), other 4xx -> ERR_UNKNOWN (dead; the unknown-ID route).

Retries here are IN-LADDER only (transport-level, like the reference's
``resend_times``); scheduling retries stay DATA — an err_type row the
frontier re-queues (SURVEY.md §4.1).  The two budgets compose: the
ladder absorbs transient socket noise inside one task, the state machine
owns real re-scheduling.

``requests`` is imported lazily and only when no ``transport`` callable
is injected, so the module (and its tests) work in this no-network,
no-requests sandbox: tests inject mock transports raising each exception
class; the real network path is exercised only in a deployment that has
one.  Sleeps are injectable for the same reason (tests pass a recorder).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass, field


class TransportTimeout(Exception):
    """ConnectTimeout / ReadTimeout / Timeout analog."""


class TransportProxyError(Exception):
    """requests.exceptions.ProxyError analog."""


class TransportSSLError(Exception):
    """requests.exceptions.SSLError analog."""


class TransportError(Exception):
    """Any other RequestException analog."""


# err_type contract (frontier.state_updates): 1 request-failed (retry w/
# backoff), 2 timeout (retry w/ backoff), 3 unknown (dead).
ERR_OK, ERR_REQUEST, ERR_TIMEOUT, ERR_UNKNOWN = 0, 1, 2, 3


@dataclass
class FetchOutcome:
    status: int          # HTTP status, or 0 when no response was obtained
    err_type: int        # ERR_* above
    body: str | None     # response text when err_type == ERR_OK
    attempts: int
    # ladder-state echoes, so callers (and tests) can see what the ladder did
    proxy_dropped: bool = False
    verify_disabled: bool = False
    log: list[str] = field(default_factory=list)


def _default_transport(url: str, timeout: float, proxy: str | None, verify: bool):
    """The real network call — requests-backed, lazily imported.  Maps
    requests' exception classes onto the module's transport exceptions so
    the ladder stays testable without requests installed."""
    import requests
    from requests import exceptions as rex

    try:
        resp = requests.get(
            url,
            timeout=timeout,
            proxies={"http": proxy, "https": proxy} if proxy else None,
            verify=verify,
        )
        return resp.status_code, resp.text
    except (rex.ConnectTimeout, rex.ReadTimeout, rex.Timeout) as e:
        raise TransportTimeout(str(e)) from e
    except rex.ProxyError as e:
        raise TransportProxyError(str(e)) from e
    except rex.SSLError as e:
        raise TransportSSLError(str(e)) from e
    except rex.RequestException as e:
        raise TransportError(str(e)) from e


def fetch_with_ladder(
    url: str,
    transport: Callable[..., tuple[int, str]] | None = None,
    timeout: float = 3.0,
    resend_times: int = 1,
    proxy: str | None = None,
    verify: bool = True,
    sleep: Callable[[float], None] | None = None,
) -> FetchOutcome:
    """One URL through the typed retry ladder (basicRequest's semantics,
    deterministic: fixed backoff instead of random.uniform so a replayed
    round behaves identically).

    ``transport(url, timeout, proxy, verify) -> (status, body)`` raises
    TransportTimeout / TransportProxyError / TransportSSLError /
    TransportError; defaults to the requests-backed real call."""
    if transport is None:
        transport = _default_transport
    if sleep is None:
        import time as _time

        sleep = _time.sleep
    out = FetchOutcome(status=0, err_type=ERR_UNKNOWN, body=None, attempts=0)
    budget = max(0, int(resend_times))
    pending_err = ERR_UNKNOWN
    while True:
        out.attempts += 1
        try:
            status, body = transport(url, timeout, proxy, verify)
        except TransportTimeout:
            pending_err = ERR_TIMEOUT
            out.log.append(f"timeout@{timeout:g}")
            if budget > 0:
                budget -= 1
                sleep(0.5)          # ref: random.uniform(0,1) — fixed here
                timeout += 1.0      # ref: options['timeout'] += 1
                continue
        except TransportProxyError:
            pending_err = ERR_REQUEST
            out.log.append(f"proxyerror@{proxy}")
            if budget > 0:
                budget -= 1
                proxy = None        # ref: options['proxies'] = None
                out.proxy_dropped = True
                continue
        except TransportSSLError:
            pending_err = ERR_REQUEST
            out.log.append("sslerror")
            if budget > 0:
                budget -= 1
                verify = False      # ref: options['verify'] = False
                out.verify_disabled = True
                continue
        except TransportError:
            pending_err = ERR_UNKNOWN
            out.log.append("othererror")
            if budget > 0:
                budget -= 1
                sleep(2.0)          # ref: random.uniform(1,3) — fixed here
                continue
        else:
            out.status = status
            if 200 <= status < 300:
                out.err_type = ERR_OK
                out.body = body
            elif status in (408, 429) or status >= 500:
                # retryable server-side failure: hand back to the frontier
                # state machine (err 1/2 -> retry with backoff)
                out.err_type = ERR_TIMEOUT if status == 408 else ERR_REQUEST
            else:
                out.err_type = ERR_UNKNOWN  # 4xx: the unknown-ID dead route
            return out
        out.err_type = pending_err
        return out


def make_browser_fetch_fn(
    render,
    renderer_pool: list[str] | None = None,
    keep_body: bool = False,
):
    """S3: JS-rendered fetch via an EXTERNAL renderer pool — the last §2
    row (the reference drives Chrome/PhantomJS for form login + cookie
    harvest, china_mobile_gd.py:76-148).  An executor cannot host a
    browser; the honest Spark-shaped form is a seam: ``render(url,
    endpoint) -> (status, html)`` speaks to a remote rendering service
    (CDP/Selenium grid/headless farm), and each PARTITION pins one pool
    endpoint (same affinity rule as proxies/T5 — a replayed round rides
    the same renderer, so cookie/session state is deterministic per
    partition).

    Everything downstream is identical to the other fetchers: the
    rendered DOM (which may contain JS-materialized content absent from
    the raw response) parses through html_to_spans into the flat fetch
    columns inside this one python stage; the JVM assembles spans.
    ``render`` raising any Transport* exception routes the row to the
    matching err_type — renderer crashes are data, not task failures.
    Contract-tested with a scripted renderer; no browser runs in CI."""
    import numpy as np
    import pandas as pd
    from pyspark import TaskContext

    from . import canon
    from .parse import html_to_spans

    def flat_from_body(body):
        spans = html_to_spans(body) if body else []
        title = next((s["text"] for s in spans if s["kind"] == "title"), "")
        texts = [s["text"] for s in spans if s["kind"] == "text"][:2]
        media = next((s["media_ref"] for s in spans if s["kind"] == "media"), None)
        links = [s["text"] for s in spans if s["kind"] == "link"][:3]
        return title, texts, media, links

    def fetch_fn(batches):
        session = None
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        for pdf in batches:
            if session is None:
                endpoint = (
                    renderer_pool[pid % len(renderer_pool)] if renderer_pool else None
                )
                session = {"partition": pid, "endpoint": endpoint}
            n = len(pdf)
            status = np.zeros(n, dtype=np.int32)
            err = np.zeros(n, dtype=np.int32)
            cols = {
                "title": [""] * n, "text1": [""] * n,
                "has_media": np.zeros(n, dtype=bool), "media_ref": [""] * n,
                "has_text2": np.zeros(n, dtype=bool), "text2": [""] * n,
                "n_links": np.zeros(n, dtype=np.int32),
                "link0": [""] * n, "link1": [""] * n, "link2": [""] * n,
            }
            bodies = [None] * n
            for i, url in enumerate(pdf["url"].tolist()):
                try:
                    st, html = render(url, session["endpoint"])
                except TransportTimeout:
                    status[i], err[i] = 0, ERR_TIMEOUT
                    continue
                except (TransportProxyError, TransportSSLError):
                    status[i], err[i] = 0, ERR_REQUEST
                    continue
                except TransportError:
                    status[i], err[i] = 0, ERR_UNKNOWN
                    continue
                status[i] = st
                if not (200 <= st < 300):
                    err[i] = (
                        ERR_TIMEOUT if st == 408
                        else ERR_REQUEST if st in (429,) or st >= 500
                        else ERR_UNKNOWN
                    )
                    continue
                title, texts, media, links = flat_from_body(html)
                cols["title"][i] = title
                cols["text1"][i] = texts[0] if texts else ""
                cols["has_media"][i] = media is not None
                cols["media_ref"][i] = media or ""
                cols["has_text2"][i] = len(texts) > 1
                cols["text2"][i] = texts[1] if len(texts) > 1 else ""
                cols["n_links"][i] = len(links)
                for j, l in enumerate(links):
                    cols[f"link{j}"][i] = l
                bodies[i] = html
            out = pdf[
                ["url", "url_hash", "host", "priority", "depth",
                 "retry_count", "discovered_round"]
            ].copy()
            out["partition_id"] = np.int32(pid)
            out["status"] = status
            out["err_type"] = err
            ok = err == 0
            out["doc_id"] = np.where(ok, "doc:" + pdf["url"].astype(str), None)
            for c, vals in cols.items():
                out[c] = vals
            for c in ("link0", "link1", "link2"):
                out[c] = canon.canonicalize_series(
                    pd.Series(out[c]), bases=pdf["url"].reset_index(drop=True)
                ).astype(object)
            if keep_body:
                out["body"] = pd.array(
                    [b if o else None for b, o in zip(bodies, ok)], dtype=object
                )
            yield out

    return fetch_fn


def make_http_fetch_fn(
    transport: Callable[..., tuple[int, str]] | None = None,
    timeout: float = 3.0,
    resend_times: int = 1,
    proxies: list[str] | None = None,
    keep_body: bool = False,
    sleep: Callable[[float], None] | None = None,
):
    """A drop-in replacement for ``fetch.make_fetch_fn`` backed by the
    REAL transport ladder: same mapInPandas contract, same flat output
    schema (fetch._RAW_SCHEMA [+ body]), so ``fetch_batch``'s JVM span
    assembly, link canonicalization placement, and the one-python-stage
    rule all hold unchanged.  Bodies parse through the SAME html_to_spans
    scanner the raw-body re-parse tests gate, then flatten to the fetch
    stage's flat columns (title/text1/media/text2/up-to-3 links).

    Proxy affinity matches the simnet fetcher: the partition's session
    pins one proxy from the pool (T5); the ladder may then drop it for
    that partition on a ProxyError, exactly like the reference."""
    import numpy as np
    import pandas as pd
    from pyspark import TaskContext

    from . import canon
    from .parse import html_to_spans

    def flat_from_body(body: str | None) -> dict:
        """spans -> the fetch stage's flat columns (first title, first
        two texts, first media, first three links — the simnet page
        shape; real pages simply truncate to it)."""
        spans = html_to_spans(body) if body else []
        title = next((s["text"] for s in spans if s["kind"] == "title"), "")
        texts = [s["text"] for s in spans if s["kind"] == "text"][:2]
        media = next((s["media_ref"] for s in spans if s["kind"] == "media"), None)
        links = [s["text"] for s in spans if s["kind"] == "link"][:3]
        return {
            "title": title,
            "text1": texts[0] if texts else "",
            "has_media": media is not None,
            "media_ref": media or "",
            "has_text2": len(texts) > 1,
            "text2": texts[1] if len(texts) > 1 else "",
            "n_links": len(links),
            "links": links + [""] * (3 - len(links)),
        }

    def fetch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        session: dict | None = None
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        for pdf in batches:
            if session is None:
                session = {
                    "partition": pid,
                    "proxy": proxies[pid % len(proxies)] if proxies else None,
                }
            n = len(pdf)
            status = np.zeros(n, dtype=np.int32)
            err = np.zeros(n, dtype=np.int32)
            cols = {
                "title": [""] * n, "text1": [""] * n,
                "has_media": np.zeros(n, dtype=bool), "media_ref": [""] * n,
                "has_text2": np.zeros(n, dtype=bool), "text2": [""] * n,
                "n_links": np.zeros(n, dtype=np.int32),
                "link0": [""] * n, "link1": [""] * n, "link2": [""] * n,
            }
            bodies: list[str | None] = [None] * n
            for i, url in enumerate(pdf["url"].tolist()):
                o = fetch_with_ladder(
                    url, transport=transport, timeout=timeout,
                    resend_times=resend_times, proxy=session["proxy"],
                    sleep=sleep,
                )
                if o.proxy_dropped:
                    session["proxy"] = None  # partition-session drops it too
                status[i], err[i] = o.status, o.err_type
                if o.err_type == ERR_OK:
                    f = flat_from_body(o.body)
                    for k in ("title", "text1", "media_ref", "text2"):
                        cols[k][i] = f[k]
                    cols["has_media"][i] = f["has_media"]
                    cols["has_text2"][i] = f["has_text2"]
                    cols["n_links"][i] = f["n_links"]
                    for j in range(3):
                        cols[f"link{j}"][i] = f["links"][j]
                    bodies[i] = o.body
            out = pdf[
                ["url", "url_hash", "host", "priority", "depth",
                 "retry_count", "discovered_round"]
            ].copy()
            out["partition_id"] = np.int32(pid)
            out["status"] = status
            out["err_type"] = err
            ok = err == 0
            out["doc_id"] = np.where(ok, "doc:" + pdf["url"].astype(str), None)
            for c, vals in cols.items():
                out[c] = vals
            # same placement as the simnet fetcher: canonicalize outlinks
            # INSIDE this worker (one python stage per pipeline)
            for c in ("link0", "link1", "link2"):
                out[c] = canon.canonicalize_series(
                    pd.Series(out[c]), bases=pdf["url"].reset_index(drop=True)
                ).astype(object)
            if keep_body:
                out["body"] = pd.array(
                    [b if o else None for b, o in zip(bodies, ok)], dtype=object
                )
            yield out

    return fetch_fn
