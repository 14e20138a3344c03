"""Crawl configuration — the frozen analogue of the reference Collector.

Reference: colly.go:55-134 (v2 Collector fields) and config.go:26-89
(v3 Config). A config is immutable for the life of a crawl and is
captured in UDF closures / broadcast to executors — never mutated
mid-run (the reference mutates via functional options only at
construction).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class LimitRule:
    """Per-domain politeness rule (reference: http_backend.go:53-67).

    First matching rule in priority order wins (GetMatchingRule,
    http_backend.go:134-149). ``parallelism`` caps concurrent in-flight
    requests per matching domain; the worker holds its slot for
    fetch + delay + rand(random_delay) (http_backend.go:199-211), so the
    steady-state per-domain rate is
    ``parallelism / (service + delay + E[random_delay])`` — which is the
    quantity our per-micro-batch admission quota reproduces.
    """

    domain_glob: str = "*"
    domain_regexp: str | None = None
    delay_ms: int = 0
    random_delay_ms: int = 0
    parallelism: int = 1
    # v3 labeled SubConfig (config.go:93-105, NewSubConfig
    # config.go:219-230; labeled/removable filters filter.go:81-154):
    # rules are addressable by label for per-label overrides/removal
    label: str | None = None

    def quota(self, window_ms: int, service_ms: int) -> int:
        """Max admissions for a matching domain in one micro-batch of
        simulated length ``window_ms``. Deterministic: E[random_delay]
        = random_delay_ms/2 (the reference draws uniform [0, rd))."""
        per_slot_ms = max(1, service_ms + self.delay_ms + self.random_delay_ms // 2)
        return max(1, (max(1, self.parallelism) * window_ms) // per_slot_ms)


@dataclass(frozen=True)
class CrawlConfig:
    """Admission + politeness + robots config.

    Defaults mirror the reference: ``max_depth=0`` (unlimited,
    colly.go:64), ``allow_url_revisit=False``, ``ignore_robots=True``
    (IgnoreRobotsTxt defaults true, colly.go:462),
    ``max_body_size=10MiB`` (colly.go:454), ``max_redirects=10``
    (colly.go:1341-1343).
    """

    max_depth: int = 0
    allowed_domain_globs: tuple = ()
    disallowed_domain_globs: tuple = ()
    url_filters: tuple = ()             # include regexes (≥1 must match if set)
    disallowed_url_filters: tuple = ()  # exclude regexes (checked first)
    # F6 URL-length exclusion filter (filters/urllen.go:26-34: exclude
    # when len < min or len > max); 0/0 = disabled
    url_length_min: int = 0
    url_length_max: int = 0
    # F7 revisit counts (filters/revisit.go:44-54 + SetMaxRevisits
    # config.go:366-379): a URL may be visited 1 + max_revisits times;
    # 0 = v2 visit-once semantics
    max_revisits: int = 0
    # S6 frontier capacity (queue/queue.go:35 maxLength, ErrStorageFull
    # storage/mem/fifo.go:188-190): discovered links beyond capacity are
    # dropped with a queue_full error; 0 = unbounded
    max_queue_size: int = 0
    # X4 response cache (http_backend.go:153-195 file cache; v3
    # cache.go TTL policies): GET-only, 5xx never stored; entries
    # expire after cache_ttl_batches micro-batches (0 = never — the
    # batch index is the engine's deterministic logical clock)
    cache_enabled: bool = False
    cache_ttl_batches: int = 0
    # v3 expiry policies (cache.go:153-211): "duration" = TTL above
    # (0 falls back to never — the reference's NewCacheExpiryByDuration
    # requires a positive duration); "never" = cacheExpNever; "date" =
    # cacheExpByDate, every entry invalid once the logical clock
    # reaches cache_expire_at_batch; "header" = cacheExpByHeader, the
    # entry is valid until the expiry its own response provided
    # (Cache-Control s-maxage/max-age minus Age, response.go:108-149 —
    # parsed from live responses, or the corpus's cache_max_age
    # column), and responses without one are not replayable.
    cache_expiry_policy: str = "duration"  # duration | never | date | header
    cache_expire_at_batch: int = 0
    # HTTP revalidation (engine extension beyond the reference's
    # transparent cache; RFC 9111 §4.3): when on, a STALE cache entry
    # that carries a validator (the response's ETag) is not refetched
    # blindly — the request goes out conditional (If-None-Match) and a
    # 304 Not Modified replays the stored entry body-free AND
    # refreshes its expiry from the 304's own caching headers. Default
    # off = reference semantics (stale entries refetch fully).
    cache_revalidate: bool = False
    # F9 per-request abort (Request.Abort() in OnRequest,
    # colly.go:655-657 / request.go:123-125): admitted requests whose
    # URL matches any of these regexes are dropped AFTER the seen-mark
    # and BEFORE the fetch, silently (the reference returns nil — no
    # error callback fires)
    abort_url_filters: tuple = ()
    # F9 abort AFTER headers (Request.Abort() inside OnResponseHeaders,
    # colly.go:673-680 checkHeadersFunc / http_backend.go:223-227,
    # colly_test.go:520-540): final responses whose Content-Type
    # matches any of these regexes abort the body download — the
    # request errors with ErrAbortedAfterHeaders, OnResponse/parse
    # never fire, and nothing is cached. Evaluated on the FINAL
    # response (the reference's transport follows redirects before the
    # headers callback fires once).
    abort_header_content_types: tuple = ()
    # Request.Retry (request.go:190-198): re-submit the request with
    # the same parameters at the same depth, BYPASSING check-and-mark
    # (scrape's checkRevisit=false — no revisit error, no new mark).
    # The reference leaves the retry decision to an OnError callback;
    # the engine's declarative surface retries final GET/POST
    # responses whose status is in this set, up to max_retries
    # attempts per request. Each attempt re-runs the full pipeline in
    # the NEXT batch (trace row + http_NNN error per attempt); retries
    # re-enter via scrape, so the queue-capacity guard doesn't apply.
    retry_http_statuses: tuple = ()
    max_retries: int = 1
    # X5 CheckHead (colly.go:491-497): every GET is preceded by a HEAD
    # of the same URL; a HEAD failure aborts the GET. HEAD requests are
    # never seen-marked and skip robots.
    check_head: bool = False
    # Per-host error-budget circuit breaker (engine extension — the
    # reference has no analogue; at a 10^10-URL frontier a dead host
    # otherwise burns its politeness quota every batch forever).
    # A host whose admitted fetches ALL fail with a transport error
    # (fetch_missing — the network-error analogue) for
    # ``host_error_budget`` consecutive fetching batches is blocked
    # for ``host_cooldown_batches`` batches: its pending rows defer
    # exactly like quota-deferred rows (already seen-marked, never
    # dropped), then the host gets a fresh budget. 0 = disabled
    # (reference semantics — the parity suite pins that default).
    host_error_budget: int = 0
    host_cooldown_batches: int = 3
    # Adaptive politeness from server back-pressure (engine extension —
    # the reference surfaces 429/503 to OnError and leaves the policy
    # to the caller). When on, a FINAL response with status 429/503
    # that carries a Retry-After of r seconds blocks its host for
    # ceil(r*1000 / batch_window_ms) batches (capped below), through
    # the same hosthealth deferral as the circuit breaker: the host's
    # pending rows (including the 429'd request's own retry, when
    # retry_http_statuses admits one) defer exactly like
    # quota-deferred rows. False = reference semantics (the parity
    # suite pins the default).
    respect_retry_after: bool = False
    # upper bound on one Retry-After block, in batches — a server
    # advertising an absurd value must not park a host forever
    retry_after_cap_batches: int = 64
    # robots.txt Crawl-delay politeness (engine extension — the
    # reference's robotstxt library parses the directive, temoto
    # CrawlDelay, but colly never applies it; a real 10^10-frontier
    # crawl must). When on, a host whose applicable robots UA group
    # advertises ``Crawl-delay: r`` fetches at most once per r
    # seconds: sub-window delays divide the batch quota
    # (min(rule_quota, window_ms // (r*1000))), super-window delays
    # admit one batch then block the host ceil(r*1000/window_ms)-1
    # batches through the same hosthealth deferral as the breaker /
    # Retry-After. Capped below (the common-crawler practice — an
    # absurd advertised delay must not park a host forever). False =
    # reference semantics (the parity suite pins the default).
    respect_crawl_delay: bool = False
    crawl_delay_cap_s: int = 30
    allow_url_revisit: bool = False
    # X3 DetectCharset (colly.go:104-106, config.go:41-42): when no
    # charset is declared (Content-Type param / <meta> / <?xml?>),
    # statistically detect the body encoding instead of falling back
    # to utf-8+replacement. Deterministic subset of chardet: BOMs,
    # strict-UTF8 validation, windows-1252 fallback.
    detect_charset: bool = False
    ignore_robots: bool = True
    user_agent: str = "colly-spark/1.0"
    # RandomUserAgent extension (extensions/random_user_agent.go:24-29):
    # non-empty pool → per-request UA chosen deterministically from the
    # request hash (the engine's seeded stand-in for "random"); the
    # chosen UA drives robots UA-group selection per request. Empty →
    # the fixed user_agent above.
    user_agents: tuple = ()
    # SetCustomHeaders / HeaderCallback (config.go:20-23, 282-292;
    # applied to every page request in scrape(), colly.go:598-606):
    # common headers attached to each live fetch. A User-Agent entry
    # here suppresses the per-request UA pick — the reference sets UA
    # only when the header is absent (colly.go:608-610). robots.txt
    # fetches are a bare client Get (colly.go:799) and skip these.
    custom_headers: tuple = ()  # tuple[(name, value), ...]
    # ProxyFunc seam (proxy/proxy.go:27-58 round-robin switcher,
    # per-request proxy recorded in ctx colly.go:682-684): non-empty →
    # proxy = proxies[seq % len], recorded in the trace. No network in
    # the sandbox, so this is the ctx/bookkeeping seam the fetch UDF
    # inherits at deployment.
    proxies: tuple = ()
    # DisableCookies (colly.go:981-985): jar off even when responses
    # set cookies — no Cookie header sent, no Set-Cookie committed
    disable_cookies: bool = False
    # SetCookies (colly.go:1243-1253): jar entries seeded before the
    # first request; tuple of (host, name, value). Later Set-Cookie
    # responses for the same (host, name) override them.
    initial_cookies: tuple = ()
    max_body_size: int = 10 * 1024 * 1024
    max_redirects: int = 10
    # D3 FollowRedirects=false (config.go:47, env colly.go:252-258):
    # stop at the first response — a 3xx is returned as the final
    # response, its target is never filtered/marked/fetched
    follow_redirects: bool = True
    # ParseStatusCallback (config.go:20,65; PARSE_HTTP_ERROR_RESPONSE
    # env setter config.go:164-173): the status gate that decides
    # whether a response body is parsed. False = the default
    # success-only gate (v2's status<203, colly.go:1185-1190); True =
    # v3's parseErrorResponse (config.go:190) — ONLY status ≥ 400
    # responses parse (the callback replaces the gate, it doesn't
    # extend it).
    parse_error_response: bool = False
    # micro-batch politeness window (the "simulated second" each
    # foreachBatch drain represents) + assumed per-request service time
    batch_window_ms: int = 1000
    service_time_ms: int = 20
    limit_rules: tuple = field(default_factory=tuple)  # tuple[LimitRule]
    seed: int = 42  # drives deterministic pseudo-random delay

    def pick_user_agent(self, req_hash_signed: int) -> str:
        """Per-request UA from the pool, keyed on the request hash —
        reproduces the engine's JVM expression exactly: Java's wrapping
        int64 add of the seed, then pmod by the pool size."""
        if not self.user_agents:
            return self.user_agent
        x = req_hash_signed + self.seed
        if x > (1 << 63) - 1:
            x -= 1 << 64
        elif x < -(1 << 63):
            x += 1 << 64
        return self.user_agents[x % len(self.user_agents)]

    def pick_proxy(self, seq: int) -> str | None:
        """Round-robin proxy per submission seq (proxy.go:27-58)."""
        if not self.proxies:
            return None
        return self.proxies[seq % len(self.proxies)]

    def matching_rule(self, host: str) -> LimitRule | None:
        """First-match-wins over priority-ordered rules
        (http_backend.go:134-149: regexp OR glob on host)."""
        import fnmatch
        import re

        for r in self.limit_rules:
            if r.domain_regexp and re.search(r.domain_regexp, host):
                return r
            if r.domain_glob and fnmatch.fnmatchcase(host, r.domain_glob):
                return r
        return None

    # --- environment configuration (env.go + EnvMap) ----------------------
    @classmethod
    def from_env(cls, env: dict | None = None, prefix: str = "COLLY_",
                 dict_map: dict | None = None,
                 base: "CrawlConfig | None" = None,
                 warn=None) -> "CrawlConfig":
        """Build a config from environment variables — env.go
        NewEnvFromMap/NewEnvFromOS semantics (prefix filter + optional
        key-translation dictionary) driving the EnvMap setters
        (config.go:108-186). Unknown keys and unparsable values are
        warned and skipped, matching the reference's
        logError-and-continue behavior. ``env=None`` reads os.environ
        (colly.go:1358 filters on the COLLY_ prefix)."""
        import os as _os
        from dataclasses import replace

        if env is None:
            env = dict(_os.environ)
        dict_map = dict_map or {}
        warn = warn or (lambda msg: None)
        values = {}
        for k, v in env.items():
            if not k.startswith(prefix):
                continue
            key = k[len(prefix):]
            values[dict_map.get(key, key)] = v

        def to_bool(s):
            t = s.strip().lower()
            if t in ("1", "true", "t", "y", "yes", "on"):
                return True
            if t in ("0", "false", "f", "n", "no", "off"):
                return False
            raise ValueError(f"not a bool: {s!r}")

        kw = {}
        setters = {
            "ALLOWED_DOMAINS": lambda v: kw.update(
                allowed_domain_globs=tuple(v.split(","))),
            "DISALLOWED_DOMAINS": lambda v: kw.update(
                disallowed_domain_globs=tuple(v.split(","))),
            "USER_AGENT": lambda v: kw.update(user_agent=v),
            "IGNORE_ROBOTSTXT": lambda v: kw.update(ignore_robots=to_bool(v)),
            "DETECT_CHARSET": lambda v: kw.update(detect_charset=to_bool(v)),
            "FOLLOW_REDIRECTS": lambda v: kw.update(follow_redirects=to_bool(v)),
            "MAX_BODY_SIZE": lambda v: kw.update(max_body_size=int(v)),
            "MAX_DEPTH": lambda v: kw.update(max_depth=int(v)),
            "MAX_REVISIT": lambda v: kw.update(max_revisits=int(v)),
            "PARSE_HTTP_ERROR_RESPONSE": lambda v: kw.update(
                parse_error_response=to_bool(v)),
            # CACHE_DIR (config.go:134-137): the reference attaches a
            # filesystem cache at that dir; our cache lives in the
            # crawl state dir, so any value just enables it
            "CACHE_DIR": lambda v: kw.update(cache_enabled=True),
        }
        for key, val in values.items():
            fn = setters.get(key)
            if fn is None:
                warn(f"unknown config key {key!r}")
                continue
            try:
                fn(val)
            except (ValueError, TypeError) as e:
                warn(f"{key} error: {e}")
        return replace(base, **kw) if base is not None else cls(**kw)

    # --- v3 labeled SubConfig surface (P3) --------------------------------
    # The reference's filter/config objects are labeled, removable, and
    # per-label overridable (filter.go:81-154 labeled adders,
    # NewSubConfig config.go:219-230). Configs here are frozen, so the
    # label operations return a NEW CrawlConfig — the same crawl-start
    # immutability the engine broadcasts.
    def with_rule_override(self, label: str, **overrides) -> "CrawlConfig":
        """New config with the labeled rule's fields replaced (e.g.
        ``delay_ms=500`` — the SubConfig per-label override)."""
        from dataclasses import replace

        rules = tuple(
            replace(r, **overrides) if r.label == label else r
            for r in self.limit_rules)
        return replace(self, limit_rules=rules)

    def without_rule(self, label: str) -> "CrawlConfig":
        """New config with the labeled rule removed (removable labeled
        filters, filter.go:118-131)."""
        from dataclasses import replace

        return replace(self, limit_rules=tuple(
            r for r in self.limit_rules if r.label != label))

    def rule_by_label(self, label: str) -> LimitRule | None:
        for r in self.limit_rules:
            if r.label == label:
                return r
        return None

    def domain_quota(self, host: str) -> int:
        rule = self.matching_rule(host)
        if rule is None:
            return 1 << 30  # no rule → unbounded (reference: nil rule skips the semaphore)
        return rule.quota(self.batch_window_ms, self.service_time_ms)


# Error taxonomy — matches the reference error set (colly.go:204-231)
ERR_MAX_DEPTH = "max_depth"
ERR_FORBIDDEN_DOMAIN = "forbidden_domain"
ERR_FORBIDDEN_URL = "forbidden_url"
ERR_NO_URL_FILTERS_MATCH = "no_url_filters_match"
ERR_ROBOTS = "robots_blocked"
ERR_ALREADY_VISITED = "already_visited"
ERR_MISSING = "fetch_missing"   # URL not in corpus (analogue of network error)
ERR_TOO_MANY_REDIRECTS = "too_many_redirects"
ERR_URL_LENGTH = "url_length"   # F6 (v3 engine has no distinct name; ours does)
ERR_QUEUE_FULL = "queue_full"   # S6 (ErrQueueFull / ErrStorageFull)
ERR_ABORTED_AFTER_HEADERS = "aborted_after_headers"  # base.go:35 / colly.go:228
