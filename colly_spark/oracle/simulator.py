"""Pure-Python reference simulator — the golden oracle.

Implements the reference's crawl semantics (admission order, dedup,
robots, politeness, redirects) over the synthetic corpus, emitting the
traces the Spark engine must match exactly (SURVEY.md §5: this stands
in for running the Go suite in CI).

Semantics pinned to the reference:

- requestCheck order (colly.go:715-756): MaxDepth → DisallowedURLFilters
  → URLFilters → DisallowedDomains → AllowedDomains → robots → seen.
- seen check-and-mark is atomic per request and happens BEFORE the
  fetch (colly.go:745-753) — a request deferred by politeness is
  already marked.
- HEAD skips robots (colly.go:723) and skips the revisit check entirely
  (colly.go:732-734: non-GET with nil body returns early).
- POST dedup key includes the body (colly.go:1494-1496).
- every redirect hop re-runs filters + check-and-mark on the target;
  an AlreadyVisited hop aborts the request (colly.go:1306-1354,
  colly_test.go:682-712); max 10 hops (colly.go:1341-1343).
- parse gate: extract links only when status < 203 (colly.go:1185-1190)
  and Content-Type contains "html" (colly.go:1087). With
  ParseStatusCallback = parseErrorResponse (config.go:20,189-190) the
  gate is REPLACED: only status ≥ 400 responses parse.
- politeness: per-domain admission quota per micro-batch derived from
  the first-matching LimitRule (http_backend.go:134-149, 199-211) —
  quota = parallelism × window / (service + delay + E[rand]); deferred
  requests stay pending in per-domain FIFO (seq) order.
- X4 response cache (http_backend.go:153-195, v3 cache.go:153-211):
  GET-only, probed BEFORE the CheckHead split (a cached GET skips its
  HEAD copy), stores every fresh 0<status<500 GET keyed by request
  hash, entries visible from the NEXT batch, TTL in batch logical
  time. A hit replays the final response — trace row, http_NNN error,
  discovered links and (image, caption) pairs — without touching the
  cookie jar (hits bypass Do(), so no gate and no Set-Cookie).

Crawl ordering model (the distributed-parity contract): requests are
processed in micro-batches; within a batch, per-domain admission is by
global discovery ``seq`` (FIFO). Newly discovered links get dense seqs
in (parent_seq, link_index) order. This IS "BFS per-domain FIFO":
batch boundaries track depth when quotas don't bind, and per-domain
order is discovery order always.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from colly_spark import config as cfgmod
from colly_spark.config import CrawlConfig
from colly_spark.functions.urlnorm import canonicalize, hostname, request_hash
from colly_spark.operators import robots as robotsmod
from colly_spark.operators.extract import decode_body, extract_page


@dataclass
class SimResult:
    # (batch, seq, url, final_url, depth, host, status)
    trace: list = field(default_factory=list)
    # final URL-seen store: {url_hash (unsigned) → visit count}
    # (v3 visit-count semantics, filters/revisit.go; iterating yields
    # the seen *set*, v2 semantics)
    seen: dict = field(default_factory=dict)
    # (url, error_kind)
    errors: list = field(default_factory=list)
    # (page_url, image_url, image_id, caption_from_page)
    images: list = field(default_factory=list)
    # per-batch metric dicts
    metrics: list = field(default_factory=list)

    def per_domain_order(self) -> dict[str, list[str]]:
        out: dict[str, list[str]] = {}
        for t in sorted(self.trace,
                        key=lambda t: (t[0], t[5], t[1], 0 if t[7] == "HEAD" else 1)):
            out.setdefault(t[5], []).append(t[2])
        return out


def _glob_any(host: str, globs) -> bool:
    import fnmatch

    return any(fnmatch.fnmatchcase(host, g) for g in globs)


class Simulator:
    def __init__(self, corpus: dict, cfg: CrawlConfig):
        """corpus: dict of pandas DataFrames from fixtures.make_corpus."""
        self.cfg = cfg
        pages = corpus["pages"]
        self.pages = {
            r.url: r for r in pages.itertuples(index=False)
        }
        self.robots = {
            r.host: (r.body, bool(r.fetch_error))
            for r in corpus["robots"].itertuples(index=False)
        }
        self.images_by_id = {
            r.image_id: r for r in corpus["images"].itertuples(index=False)
        }
        self._url_res = [re.compile(p) for p in cfg.url_filters]
        self._durl_res = [re.compile(p) for p in cfg.disallowed_url_filters]
        self._abort_res = [re.compile(p) for p in cfg.abort_url_filters]
        self._hdr_abort_res = [re.compile(p)
                               for p in cfg.abort_header_content_types]

    def _cache_valid(self, ent, batch) -> bool:
        """X4 expiry policies (cache.go:153-211) in batch logical time,
        mirroring the engine's _cache_latest exactly."""
        p = getattr(self.cfg, "cache_expiry_policy", "duration")
        if p == "never":
            return True
        if p == "date":
            cut = self.cfg.cache_expire_at_batch
            return not (cut > 0 and batch >= cut)
        if p == "header":
            # cacheExpByHeader: valid only while the response's own
            # expiry lies ahead; no max-age header → never replayable
            return ent["expiry"] is not None and ent["expiry"] > batch
        ttl = self.cfg.cache_ttl_batches
        return ttl == 0 or ent["created"] + ttl > batch

    def _entry_expiry(self, row, batch):
        """Engine formula: c_expiry = batch + ceil(max_age·1000 /
        batch_window_ms); None without a max-age header."""
        import math

        ma = getattr(row, "cache_max_age", None)
        if ma is None or (isinstance(ma, float) and math.isnan(ma)):
            return None
        return batch + math.ceil(int(ma) * 1000 / self.cfg.batch_window_ms)

    def _hdr_abort(self, row) -> bool:
        """F9 headers-abort (checkHeadersFunc colly.go:673-680 /
        http_backend.go:223-227): the final response's Content-Type
        matches an abort pattern. Cookie-blocked synthetic 403s carry
        no Content-Type (row is None) — never aborted."""
        if not self._hdr_abort_res or row is None:
            return False
        ct = getattr(row, "content_type", None)
        return isinstance(ct, str) and any(
            r.search(ct) for r in self._hdr_abort_res)

    # --- admission -----------------------------------------------------
    def _check_filters(self, canon: str, host: str, depth: int) -> str | None:
        cfg = self.cfg
        if cfg.max_depth > 0 and depth > cfg.max_depth:
            return cfgmod.ERR_MAX_DEPTH
        if self._durl_res and any(r.search(canon) for r in self._durl_res):
            return cfgmod.ERR_FORBIDDEN_URL
        if (cfg.url_length_min or cfg.url_length_max) and (
                len(canon) < cfg.url_length_min
                or (cfg.url_length_max and len(canon) > cfg.url_length_max)):
            return cfgmod.ERR_URL_LENGTH
        if self._url_res and not any(r.search(canon) for r in self._url_res):
            return cfgmod.ERR_NO_URL_FILTERS_MATCH
        if cfg.disallowed_domain_globs and _glob_any(host, cfg.disallowed_domain_globs):
            return cfgmod.ERR_FORBIDDEN_DOMAIN
        if cfg.allowed_domain_globs and not _glob_any(host, cfg.allowed_domain_globs):
            return cfgmod.ERR_FORBIDDEN_DOMAIN
        return None

    @staticmethod
    def _signed(h: int) -> int:
        return h - (1 << 64) if h >= (1 << 63) else h

    def _check_robots(self, canon: str, host: str, method: str,
                      ua: str) -> str | None:
        if method == "HEAD" or self.cfg.ignore_robots:
            return None
        body, fetch_error = self.robots.get(host, (None, False))
        if not robotsmod.robots_allowed(canon, body, fetch_error, ua):
            return cfgmod.ERR_ROBOTS
        return None

    def _admit(self, canon, host, depth, method, body, seen,
               no_revisit=False) -> str | None:
        """Full requestCheck. Returns error kind or None (admitted).
        Mutates ``seen`` (check-and-mark). The per-request UA (random-
        UA pool) is derived from this request's own hash — redirect
        targets re-derive from the target hash, like the engine.
        ``no_revisit`` = scrape's checkRevisit=false (Request.Retry,
        request.go:190-198): filters and robots still run, the seen
        block is skipped entirely (no check, no mark)."""
        err = self._check_filters(canon, host, depth)
        if err:
            return err
        ua = self.cfg.pick_user_agent(self._signed(request_hash(canon, body)))
        err = self._check_robots(canon, host, method, ua)
        if err:
            return err
        if not self.cfg.allow_url_revisit and not no_revisit:
            if method != "GET" and body is None:
                return None  # HEAD & bodyless POST: no check, no mark
            h = request_hash(canon, body)
            # past_visits > max_revisits → blocked (filters/revisit.go:44-54;
            # max_revisits=0 reproduces v2 visit-once)
            if seen.get(h, 0) > self.cfg.max_revisits:
                return cfgmod.ERR_ALREADY_VISITED
            seen[h] = seen.get(h, 0) + 1
        return None

    # --- drive -----------------------------------------------------------
    def run(self, seeds, max_batches: int = 10_000) -> SimResult:
        """seeds: iterable of url strings (submission order),
        (url, method, body) tuples, (url, method, body, depth) tuples,
        or (url, method, body, depth, ctx) — ctx a dict seeding the
        generic request Context (context.go:22-88), inherited verbatim
        by every descendant request (request.go:151-153)."""
        from colly_spark.functions.context import ctx_json

        res = SimResult()
        frontier: list[tuple] = []  # (seq, url_raw, depth, method, body, referer, ctx)
        next_seq = 0
        for s in seeds:
            depth, ctx = 1, None
            if isinstance(s, str):
                url, method, body = s, "GET", None
            elif len(s) == 5:
                url, method, body, depth, ctx = s
            elif len(s) == 4:
                url, method, body, depth = s
            else:
                url, method, body = s
            frontier.append((next_seq, url, depth, method, body, None,
                             ctx_json(ctx), False, 0))
            next_seq += 1
        # admitted, awaiting fetch:
        # (seq, canon, depth, host, method, body, referer, rhash, ctx, tries)
        pending: list[tuple] = []
        # cookie jar: host → {name: value}; Set-Cookie rows staged
        # during a batch become visible the NEXT batch (concurrent
        # requests in one politeness window don't see each other)
        jar: dict[str, dict[str, str]] = {}
        # X4 response cache: request-hash → latest committed entry;
        # entries staged during a batch become probe-able the NEXT
        # batch (the engine reads only earlier batches' cache deltas)
        cache: dict[int, dict] = {}
        batch = 0
        while (frontier or pending) and batch < max_batches:
            m = dict(batch=batch, submitted=len(frontier), admitted=0, fetched=0,
                     deferred=0, errors=0, new_links=0)
            if self.cfg.cache_enabled:
                m["cache_hits"] = 0
            if self.cfg.cache_enabled and getattr(self.cfg, "cache_revalidate",
                                                  False):
                m["revalidated"] = 0
            # 1. admission on new frontier rows, in seq order
            for (seq, raw, depth, method, body, referer, ctx, no_rv,
                 tries) in sorted(frontier, key=lambda t: t[0]):
                canon = canonicalize(raw)
                if not canon:
                    res.errors.append((raw, cfgmod.ERR_MISSING))
                    m["errors"] += 1
                    continue
                host = hostname(canon)
                err = self._admit(canon, host, depth, method, body, res.seen,
                                  no_revisit=no_rv)
                if err:
                    res.errors.append((canon, err))
                    m["errors"] += 1
                    continue
                pending.append((seq, canon, depth, host, method, body, referer,
                                request_hash(canon, body), ctx, tries))
                m["admitted"] += 1
            frontier = []
            # 2. politeness: per-domain quota by seq order
            pending.sort(key=lambda t: t[0])
            quotas: dict[str, int] = {}
            fetch_now, defer = [], []
            for item in pending:
                host = item[3]
                q = quotas.setdefault(host, self.cfg.domain_quota(host))
                if q > 0:
                    quotas[host] = q - 1
                    fetch_now.append(item)
                else:
                    defer.append(item)
            pending = defer
            m["deferred"] = len(defer)
            # 3. fetch + redirects + extraction
            new_frontier: list[tuple] = []
            # Request.Retry re-submissions (request.go:190-198): same
            # parameters, same depth, checkRevisit=false; enter the
            # next batch's frontier AFTER this batch's links, exempt
            # from the queue-capacity guard
            retries: list[tuple] = []
            staged_cookies: list[tuple] = []
            staged_cache: list[tuple] = []

            def _maybe_retry(final_url, status, method, depth, body, referer,
                             ctx, tries):
                if (self.cfg.retry_http_statuses and method != "HEAD"
                        and status in self.cfg.retry_http_statuses
                        and tries < self.cfg.max_retries):
                    retries.append((final_url, depth, method, body, referer,
                                    ctx, tries + 1))
            for (seq, canon, depth, host, method, body, referer, rhash, ctx,
                 tries) in fetch_now:
                ua = self.cfg.pick_user_agent(self._signed(rhash))
                proxy = self.cfg.pick_proxy(seq)
                # F9: abort after mark, before fetch — silent
                # (colly.go:655-657 returns nil on abort)
                if self._abort_res and any(r.search(canon) for r in self._abort_res):
                    continue
                # X4 cache probe — BEFORE the CheckHead split (the
                # engine probes fetch_now, then splits: a cached GET
                # never sends its HEAD copy). A hit replays the final
                # response and bypasses the cookie jar entirely.
                reval_ent = None
                if self.cfg.cache_enabled and method == "GET":
                    ent = cache.get(rhash)
                    if ent is not None and self._cache_valid(ent, batch):
                        final_url, status = ent["final_url"], ent["status"]
                        res.trace.append((batch, seq, canon, final_url, depth,
                                          hostname(final_url), status, "GET",
                                          referer, ua, proxy, ctx))
                        m["fetched"] += 1
                        m["cache_hits"] += 1
                        if status >= 400:
                            res.errors.append((canon, f"http_{status}"))
                        res.images.extend(ent["images"])
                        for li, link in enumerate(ent["links"]):
                            new_frontier.append((link, depth + 1, li, final_url, ctx))
                        # replays fire OnError too — a cached 4xx with a
                        # matching status retries like a fresh one
                        _maybe_retry(final_url, status, "GET", depth, body,
                                     referer, ctx, tries)
                        continue
                    # RFC 9111 §4.3: a STALE entry with a validator
                    # goes out conditional (If-None-Match /
                    # If-Modified-Since) instead of refetching blindly
                    # (cache_revalidate only)
                    if (ent is not None
                            and getattr(self.cfg, "cache_revalidate", False)
                            and (ent.get("etag") or ent.get("lastmod"))):
                        reval_ent = ent
                # X5 CheckHead: HEAD precedes the GET; a HEAD error
                # aborts the GET (colly.go:492-497). HEAD is unmarked
                # and skips robots.
                if self.cfg.check_head and method == "GET":
                    h_final, h_status, h_row, h_err = self._fetch_with_redirects(
                        canon, depth, "HEAD", res.seen, jar, staged_cookies)
                    if h_err:
                        res.errors.append((canon, h_err))
                        m["errors"] += 1
                        continue
                    # headers-abort applies to the HEAD too (same Do
                    # path); an aborted HEAD kills its GET like any
                    # other HEAD failure (colly.go:492-497)
                    if self._hdr_abort(h_row):
                        res.errors.append(
                            (canon, cfgmod.ERR_ABORTED_AFTER_HEADERS))
                        m["errors"] += 1
                        continue
                    res.trace.append((batch, seq, canon, h_final, depth,
                                      hostname(h_final), h_status, "HEAD",
                                      referer, ua, proxy, ctx))
                    m["fetched"] += 1
                final_url, status, row, err = self._fetch_with_redirects(
                    canon, depth, method, res.seen, jar, staged_cookies
                )
                if err:
                    res.errors.append((canon, err))
                    m["errors"] += 1
                    continue
                # F9 headers-abort on the final response: body download
                # aborted, OnResponse/parse never fire, nothing cached
                # (Do returned ErrAbortedAfterHeaders)
                if self._hdr_abort(row):
                    res.errors.append(
                        (canon, cfgmod.ERR_ABORTED_AFTER_HEADERS))
                    m["errors"] += 1
                    continue
                # RFC 9110 §13.2.2 precedence: an ETag pair decides;
                # If-Modified-Since applies only when no ETag
                # comparison is possible (mirrors the engine's
                # is_304 expression exactly)
                _r_et = getattr(row, "etag", None)
                _r_lm = getattr(row, "last_modified", None)
                if reval_ent is not None and reval_ent.get("etag") and _r_et:
                    _not_modified = _r_et == reval_ent["etag"]
                elif reval_ent is not None:
                    _not_modified = (bool(reval_ent.get("lastmod"))
                                     and _r_lm is not None
                                     and _r_lm == reval_ent["lastmod"])
                else:
                    _not_modified = False
                if _not_modified:
                    # 304 Not Modified: the validator still matches —
                    # replay the stored entry body-free AND refresh it
                    # (new created batch, the 304's own caching
                    # headers). Mirrors the engine's post-fetch 304
                    # replacement join exactly.
                    final_url, status = (reval_ent["final_url"],
                                         reval_ent["status"])
                    res.trace.append((batch, seq, canon, final_url, depth,
                                      hostname(final_url), status, "GET",
                                      referer, ua, proxy, ctx))
                    m["fetched"] += 1
                    m["revalidated"] += 1
                    if status >= 400:
                        res.errors.append((canon, f"http_{status}"))
                    res.images.extend(reval_ent["images"])
                    for li, link in enumerate(reval_ent["links"]):
                        new_frontier.append((link, depth + 1, li, final_url,
                                             ctx))
                    _maybe_retry(final_url, status, "GET", depth, body,
                                 referer, ctx, tries)
                    staged_cache.append((rhash, dict(
                        created=batch, final_url=reval_ent["final_url"],
                        status=reval_ent["status"],
                        links=list(reval_ent["links"]),
                        images=list(reval_ent["images"]),
                        expiry=self._entry_expiry(row, batch),
                        etag=getattr(row, "etag", None),
                        lastmod=getattr(row, "last_modified", None))))
                    continue
                res.trace.append((batch, seq, canon, final_url, depth,
                                  hostname(final_url), status, method,
                                  referer, ua, proxy, ctx))
                m["fetched"] += 1
                if status >= 400:
                    res.errors.append((canon, f"http_{status}"))
                _maybe_retry(final_url, status, method, depth, body, referer,
                             ctx, tries)
                # ParseStatusCallback gate (config.go:20,189-190): the
                # callback REPLACES the gate — parse_error_response
                # parses only status ≥ 400 (v3 parseErrorResponse);
                # default is v2's success-only status < 203
                gate = ((status >= 400) if self.cfg.parse_error_response
                        else (status < 203))
                if not gate or method == "HEAD":
                    # X4 store: every fresh sub-500 GET response is
                    # cached — including cookie-gate 403s and no-parse
                    # statuses (empty link/image replay)
                    if (self.cfg.cache_enabled and method == "GET"
                            and 0 < status < 500):
                        staged_cache.append((rhash, dict(
                            created=batch, final_url=final_url,
                            status=status, links=[], images=[],
                            expiry=self._entry_expiry(row, batch),
                            etag=getattr(row, "etag", None),
                            lastmod=getattr(row, "last_modified", None))))
                    continue
                # X2: transparent gzip then MaxBodySize truncation of
                # the decoded bytes (http_backend.go:229-244)
                pbody, pct = decode_body(final_url, row.body,
                                         row.content_type,
                                         self.cfg.max_body_size)
                links, images = extract_page(
                    final_url, pbody, pct,
                    detect_charset=self.cfg.detect_charset)
                req_images = [(final_url, img_url, None, caption)
                              for img_url, caption in images]
                for li, link in enumerate(links):
                    # ctx propagation: discovered links carry their
                    # parent page as referer (extensions/referer.go)
                    # and inherit the parent's generic Context
                    # verbatim (request.go:151-153)
                    new_frontier.append((link, depth + 1, li, final_url, ctx))
                # direct image fetch: validate payload row
                if row.content_type and row.content_type.startswith("image/") and row.image_id:
                    # a direct image fetch: (page_url=None, image_url, image_id, caption=None)
                    req_images.append((None, final_url, row.image_id, None))
                res.images.extend(req_images)
                if self.cfg.cache_enabled and method == "GET":
                    staged_cache.append((rhash, dict(
                        created=batch, final_url=final_url, status=status,
                        links=list(links), images=req_images,
                        expiry=self._entry_expiry(row, batch),
                        etag=getattr(row, "etag", None),
                        lastmod=getattr(row, "last_modified", None))))
            # 4. assign dense seqs to discovered links in (parent_seq, link_idx) order
            #    (new_frontier was appended in fetch order = seq order, link order);
            #    S6 capacity: links beyond max_queue_size − pending are dropped
            #    (ErrQueueFull, storage/mem/fifo.go:188-190)
            cap = self.cfg.max_queue_size
            allowed_new = (cap - len(pending)) if cap > 0 else None
            kept = 0
            for link, d, _li, parent_url, pctx in new_frontier:
                if allowed_new is not None and kept >= allowed_new:
                    res.errors.append((link, cfgmod.ERR_QUEUE_FULL))
                    m["errors"] += 1
                    continue
                frontier.append((next_seq, link, d, "GET", None, parent_url,
                                 pctx, False, 0))
                next_seq += 1
                kept += 1
            m["new_links"] = kept
            # retries get seqs AFTER the batch's links, in fetch (seq)
            # order — mirrors the engine's dense_seq over orig_seq
            for (r_url, r_depth, r_method, r_body, r_ref, r_ctx,
                 r_tries) in retries:
                frontier.append((next_seq, r_url, r_depth, r_method, r_body,
                                 r_ref, r_ctx, True, r_tries))
                next_seq += 1
            # commit staged Set-Cookie rows — visible from next batch
            for chost, cname, cval in staged_cookies:
                jar.setdefault(chost, {})[cname] = cval
            # commit staged cache entries — probe-able from next batch
            # (latest c_created wins; same-batch duplicates are
            # identical rows, so overwrite order is immaterial)
            for chash, ent in staged_cache:
                cache[chash] = ent
            res.metrics.append(m)
            batch += 1
        return res

    def _cookie_block(self, row, current, jar):
        """True when the page requires a cookie the jar doesn't hold
        (terminal 403 — matches the engine's cookie gate per hop)."""
        req = getattr(row, "require_cookie", None)
        if not isinstance(req, str) or not req:
            return False
        name, _, val = req.partition("=")
        return jar.get(hostname(current), {}).get(name) != val

    def _fetch_with_redirects(self, canon, depth, method, seen, jar, staged):
        """Returns (final_url, status, corpus_row, err)."""
        current = canon
        row = self.pages.get(current)
        if row is None:
            return current, 0, None, cfgmod.ERR_MISSING
        if self._cookie_block(row, current, jar):
            return current, 403, None, None
        hops = 0
        while (self.cfg.follow_redirects
               and row.status in (301, 302, 303, 307, 308) and row.redirect_to):
            hops += 1
            if hops > self.cfg.max_redirects:
                return current, row.status, None, cfgmod.ERR_TOO_MANY_REDIRECTS
            target = canonicalize(row.redirect_to)
            if not target:
                return current, row.status, None, cfgmod.ERR_MISSING
            thost = hostname(target)
            err = self._admit(target, thost, depth, method, None, seen)
            if err:
                return target, row.status, None, err
            current = target
            row = self.pages.get(current)
            if row is None:
                return current, 0, None, cfgmod.ERR_MISSING
            if self._cookie_block(row, current, jar):
                return current, 403, None, None
        sc = getattr(row, "set_cookie", None)
        if isinstance(sc, str) and sc:
            name, _, val = sc.partition("=")
            staged.append((hostname(current), name, val))
        return current, int(row.status), row, None
