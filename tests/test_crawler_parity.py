"""E2E parity: the Spark engine vs the pure-Python oracle simulator.

The simulator (oracle/simulator.py) re-expresses the reference's test
contracts (colly_test.go visit/dedup/robots/depth families,
queue/queue_test.go drain invariants) — see SURVEY.md §5. The engine
must reproduce, under each scenario config:

- the final URL-seen set exactly (dedup semantics D1/D2),
- the per-domain fetch order (BFS per-domain FIFO — the north_rule
  ordering contract),
- the error multiset (taxonomy colly.go:204-231),
- the (page → image, caption) pairs + direct-image PSNR validation.
"""

from __future__ import annotations

import pytest

from colly_spark.config import CrawlConfig, LimitRule
from colly_spark.oracle.simulator import Simulator
from colly_spark.plans.crawler import Crawler


def _run_both(spark, corpus_pd, corpus_spark, cfg, seeds, tmp_state, max_batches=60):
    sim = Simulator(corpus_pd, cfg).run(list(seeds), max_batches=max_batches)
    # bloom_threshold_rows=0 forces the Bloom-segment path so parity
    # covers it (the default adaptive threshold would bypass it at
    # fixture scale)
    eng = Crawler(spark, corpus_spark, cfg, tmp_state,
                  bloom_threshold_rows=0).run(list(seeds), max_batches=max_batches)
    return sim, eng


def _engine_seen(eng):
    return {r["url_hash"] for r in eng.visited().collect()}


def _sim_seen_signed(sim):
    return {h - (1 << 64) if h >= (1 << 63) else h for h in sim.seen}


def _engine_per_domain_order(eng):
    from pyspark.sql import functions as F

    rows = eng.trace().orderBy(
        "batch", "host", "seq",
        (F.col("method") == "GET").cast("int")).collect()
    out = {}
    for r in rows:
        out.setdefault(r["host"], []).append(r["url"])
    return out


def _errors_multiset(rows):
    from collections import Counter

    return Counter(rows)


SCENARIOS = {
    # mirror of TestCollectorVisit + depth family: single domain, depth 2
    "depth2_single_domain": dict(
        cfg=CrawlConfig(max_depth=2, allowed_domain_globs=("d00.test",), ignore_robots=True),
        seeds=["http://d00.test/"],
    ),
    # robots gating on (TestRobots* family) incl. wildcard-query rule and
    # the robots-fetch-error host
    "robots_enforced": dict(
        cfg=CrawlConfig(max_depth=3, ignore_robots=False),
        seeds=["http://d00.test/", "http://d03.test/"],
    ),
    # domain deny + URL regex filters (TestCollectorURLFilter analogues)
    "filters": dict(
        cfg=CrawlConfig(
            max_depth=3,
            disallowed_domain_globs=("d01.*",),
            disallowed_url_filters=(r"/page/1\d$",),
            ignore_robots=True,
        ),
        seeds=["http://d00.test/", "http://d01.test/"],
    ),
    # politeness: tight quota on the hot domain → multi-batch deferral
    "politeness": dict(
        cfg=CrawlConfig(
            max_depth=3,
            ignore_robots=True,
            limit_rules=(
                LimitRule(domain_glob="d00*", delay_ms=400, parallelism=1),
                LimitRule(domain_glob="*", delay_ms=100, parallelism=2),
            ),
        ),
        seeds=["http://d00.test/", "http://d01.test/", "http://d02.test/"],
    ),
    # F6 URL-length + F7 max_revisits + S6 queue capacity together
    "len_revisit_capacity": dict(
        cfg=CrawlConfig(
            max_depth=3, ignore_robots=True,
            url_length_min=10, url_length_max=60,
            max_revisits=1, max_queue_size=40,
        ),
        seeds=["http://d00.test/", "http://d01.test/"],
    ),
    # X5 CheckHead: HEAD precedes every GET
    "check_head": dict(
        cfg=CrawlConfig(max_depth=2, ignore_robots=True, check_head=True),
        seeds=["http://d00.test/"],
    ),
    # F9 abort hook: /page/2x URLs marked-but-never-fetched
    "abort": dict(
        cfg=CrawlConfig(max_depth=3, ignore_robots=True,
                        abort_url_filters=(r"/page/2\d$",)),
        seeds=["http://d00.test/"],
    ),
    # X2 MaxBodySize: bodies truncated before parse → fewer links
    "body_limit": dict(
        cfg=CrawlConfig(max_depth=2, ignore_robots=True, max_body_size=220),
        seeds=["http://d00.test/"],
    ),
    # S3 POST dedup: body participates in the hash — GET and two POSTs
    # (one duplicate body) of the same URL
    "post_dedup": dict(
        cfg=CrawlConfig(max_depth=1, ignore_robots=True),
        seeds=[
            "http://d00.test/",
            ("http://d00.test/", "POST", b"a=1"),
            ("http://d00.test/", "POST", b"a=1"),
            ("http://d00.test/", "POST", b"b=2"),
        ],
    ),
    # queue stress (TestQueue analogue, queue/queue_test.go:14-69):
    # seeded random seed list with duplicates, bad URLs tolerated;
    # invariant items == requests, per-batch metrics equal
    "queue_stress": dict(
        cfg=CrawlConfig(max_depth=2, ignore_robots=True),
        seeds=(lambda: (lambda rng: [
            (f"http://d{rng.randrange(4):02d}.test/page/{rng.randrange(30)}"
             if rng.random() > 0.1 else "not a url %zz")
            for _ in range(300)
        ])(__import__("random").Random(12387123712321232)))(),
    ),
    # F8 named-UA robots group: d01's robots has a 'colly-spark' group
    # (prefix of the default UserAgent) that REPLACES the * group —
    # /disallowed reachable, /page/3 blocked
    "robots_ua_group": dict(
        cfg=CrawlConfig(max_depth=3, ignore_robots=False),
        seeds=["http://d01.test/"],
    ),
    # D3 FollowRedirects=false: 3xx responses are final; targets never
    # marked or fetched
    "no_follow_redirects": dict(
        cfg=CrawlConfig(max_depth=3, ignore_robots=True, follow_redirects=False),
        seeds=["http://d00.test/", "http://d01.test/"],
    ),
    # X2/X3: tiny depth crawl that hits the gzip sitemap and the two
    # non-UTF8 pages from the seed page's link list
    "gzip_charset": dict(
        cfg=CrawlConfig(max_depth=2, ignore_robots=True,
                        url_filters=(r"/$", r"latin1", r"sitemap\.xml\.gz", r"/page/",)),
        seeds=["http://d00.test/"],
    ),
    # RandomUserAgent pool + proxy switcher: per-request UA drives
    # per-request robots UA-group selection on d01; round-robin proxy
    # recorded in the trace ctx
    "random_ua": dict(
        cfg=CrawlConfig(
            max_depth=3, ignore_robots=False,
            user_agents=("colly-spark/2.0", "googlebot/2.1"),
            proxies=("http://proxy0:8080", "http://proxy1:8080")),
        seeds=["http://d01.test/", "http://d00.test/"],
    ),
    # D2 cross-chain claim: two same-batch redirect chains sharing an
    # intermediate — the lower-seq chain claims /shared at hop 1, the
    # other resolves AlreadyVisited ((hop, seq) tie-break)
    "redirect_shared_intermediate": dict(
        cfg=CrawlConfig(max_depth=2, ignore_robots=True),
        seeds=["http://d00.test/rx/a", "http://d00.test/rx/b"],
    ),
    # cookie jar: /login sets sid → /account (depth 3, next batch)
    # succeeds; a directly-seeded /account with an empty jar gets 403
    "cookies": dict(
        cfg=CrawlConfig(max_depth=3, ignore_robots=True),
        seeds=["http://d00.test/", "http://d02.test/account"],
    ),
    # X4 response cache: max_revisits=1 re-admits every URL once more;
    # the second fetch (later batch) replays from the cache — trace,
    # links, images, and http_NNN errors re-emitted, cookie jar
    # untouched, HEAD copies skipped on hits
    "cache_replay": dict(
        cfg=CrawlConfig(max_depth=3, ignore_robots=True, max_revisits=1,
                        cache_enabled=True),
        seeds=["http://d00.test/", "http://d02.test/"],
    ),
    # X4 TTL expiry in batch logical time: entries created in batch b
    # are invalid from b+1 with ttl=1, so every revisit refetches
    "cache_ttl": dict(
        cfg=CrawlConfig(max_depth=2, ignore_robots=True,
                        allow_url_revisit=True, cache_enabled=True,
                        cache_ttl_batches=1),
        seeds=["http://d00.test/"],
    ),
    # X4 cacheExpByHeader (cache.go:155-162): entries live by their own
    # response's max-age — ample-max-age pages replay on revisit, zero
    # max-age is stored-but-stale, headerless pages refetch; per-batch
    # cache_hits asserted
    "cache_by_header": dict(
        cfg=CrawlConfig(max_depth=3, ignore_robots=True, max_revisits=1,
                        cache_enabled=True, cache_expiry_policy="header"),
        seeds=["http://d00.test/", "http://d02.test/"],
    ),
    # RFC 9111 §4.3 revalidation: ttl=1 makes every entry stale one
    # batch after creation; etag-carrying pages answer the conditional
    # GET with 304 → stored entry replays body-free AND refreshes
    # (per-batch `revalidated` counts asserted); every-third page has
    # no validator and refetches fully
    "cache_revalidate": dict(
        cfg=CrawlConfig(max_depth=3, ignore_robots=True, max_revisits=1,
                        cache_enabled=True, cache_ttl_batches=1,
                        cache_revalidate=True),
        seeds=["http://d00.test/", "http://d02.test/"],
    ),
    # revalidation × cacheExpByHeader: ample-max-age pages replay
    # VALID (cache hits), the directly-seeded image is stored WITHOUT
    # a max-age (stored-but-stale under the header policy) but with a
    # validator — its page-linked revisit 304s and replays the binary
    # payload incl. the PSNR validation row; no-validator pages
    # refetch fully
    "cache_reval_header": dict(
        cfg=CrawlConfig(max_depth=3, ignore_robots=True, max_revisits=1,
                        cache_enabled=True, cache_expiry_policy="header",
                        cache_revalidate=True),
        seeds=["http://d00.test/img/img00000000.png", "http://d00.test/",
               "http://d02.test/"],
    ),
    # ParseStatusCallback = parseErrorResponse (config.go:189-190):
    # ONLY status ≥ 400 responses parse — the /404 page's links are
    # extracted and crawled (landing on 200 pages that do NOT parse),
    # while the seed 200 page yields nothing
    "parse_error_pages": dict(
        cfg=CrawlConfig(max_depth=3, ignore_robots=True,
                        parse_error_response=True),
        seeds=["http://d00.test/404", "http://d00.test/",
               "http://d01.test/500"],
    ),
    # F9 headers-abort (OnResponseHeaders + Request.Abort,
    # colly_test.go:520-540): final responses with a matching
    # Content-Type abort the body download — ErrAbortedAfterHeaders,
    # no parse, no trace row, nothing cached. Direct image fetches and
    # the gzip sitemap get aborted here.
    "abort_headers": dict(
        cfg=CrawlConfig(max_depth=2, ignore_robots=True,
                        abort_header_content_types=(r"^image/",
                                                    r"^application/gzip")),
        seeds=["http://d00.test/"],
    ),
    # headers-abort × cache: Do() errored, so nothing was stored —
    # the max_revisits=1 re-admission refetches and re-aborts (two
    # aborted_after_headers errors per image URL, zero cache hits
    # for them)
    "abort_headers_cache": dict(
        cfg=CrawlConfig(max_depth=2, ignore_robots=True, max_revisits=1,
                        cache_enabled=True,
                        abort_header_content_types=(r"^image/",)),
        seeds=["http://d00.test/"],
    ),
    # headers-abort × CheckHead: the HEAD copy hits the abort first
    # and kills its GET (colly.go:492-497 — a HEAD error aborts the
    # GET), one error per request
    "abort_headers_check_head": dict(
        cfg=CrawlConfig(max_depth=2, ignore_robots=True, check_head=True,
                        abort_header_content_types=(r"^image/",)),
        seeds=["http://d00.test/"],
    ),
    # X3 DetectCharset (colly.go:104-106): the undeclared-latin-1 page
    # decodes via statistical detection — the é-href canonicalizes to
    # %C3%A9 (an ERR_MISSING error under that exact URL), /page/1
    # crawls normally
    "detect_charset": dict(
        cfg=CrawlConfig(max_depth=2, ignore_robots=True,
                        detect_charset=True),
        seeds=["http://d00.test/latin1bare"],
    ),
    # X3 statistical chardet (saintfish/chardet behind DetectCharset):
    # undeclared shift_jis / big5 / koi8-r pages — byte-bigram/
    # structural detection decodes the href so the canonical link is
    # the correct UTF-8 percent-encoding (each an ERR_MISSING under
    # that exact URL), /page/1 crawls normally
    "detect_sjis": dict(
        cfg=CrawlConfig(max_depth=2, ignore_robots=True,
                        detect_charset=True),
        seeds=["http://d00.test/sjisbare"],
    ),
    "detect_big5": dict(
        cfg=CrawlConfig(max_depth=2, ignore_robots=True,
                        detect_charset=True),
        seeds=["http://d00.test/big5bare"],
    ),
    "detect_koi8": dict(
        cfg=CrawlConfig(max_depth=2, ignore_robots=True,
                        detect_charset=True),
        seeds=["http://d00.test/koi8bare"],
    ),
    # Request.Retry (request.go:190-198): /500 responses re-submit at
    # the same depth bypassing check-and-mark — 1 fresh + 2 retry
    # attempts, each with its own trace row and http_500 error, no
    # already_visited errors for them
    "retry_500": dict(
        cfg=CrawlConfig(max_depth=2, ignore_robots=True,
                        retry_http_statuses=(500,), max_retries=2),
        seeds=["http://d00.test/500", "http://d00.test/"],
    ),
    # retry × cache: the fresh 404 is stored (sub-500 GET); every
    # retry replays it from the cache (per-batch cache_hits asserted)
    # and retries again until the attempt cap
    "retry_cache": dict(
        cfg=CrawlConfig(max_depth=1, ignore_robots=True,
                        cache_enabled=True,
                        retry_http_statuses=(404,), max_retries=2),
        seeds=["http://d00.test/404", "http://d01.test/"],
    ),
    # generic request Context (context.go:22-88): KV seeded on d00's
    # seed is inherited verbatim by every descendant request
    # (Request.Visit shares the Ctx, request.go:151-153) — through
    # links AND redirect chains — while d01's tree carries NULL;
    # asserted per-request by check #6
    "seed_ctx": dict(
        cfg=CrawlConfig(max_depth=3, ignore_robots=True),
        seeds=[("http://d00.test/", "GET", None, 1,
                {"session": "s-42", "label": "a"}),
               "http://d01.test/"],
    ),
    # full crawl, unlimited depth, everything on
    "full": dict(
        cfg=CrawlConfig(
            max_depth=0,
            ignore_robots=False,
            limit_rules=(LimitRule(domain_glob="*", delay_ms=50, parallelism=4),),
        ),
        seeds=["http://d00.test/", "http://d01.test/", "http://d02.test/", "http://d03.test/"],
    ),
}


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_parity(name, spark, corpus_pd, corpus_spark, tmp_state):
    sc = SCENARIOS[name]
    sim, eng = _run_both(spark, corpus_pd, corpus_spark, sc["cfg"], sc["seeds"], tmp_state)

    # 1. exact URL-seen set (the dedup contract)
    assert _engine_seen(eng) == _sim_seen_signed(sim), "URL-seen set mismatch"

    # 2. BFS per-domain FIFO order
    assert _engine_per_domain_order(eng) == sim.per_domain_order(), "per-domain order mismatch"

    # 3. trace size: items fetched == sim fetched (queue_test invariant
    #    items == requests)
    assert eng.trace().count() == len(sim.trace)

    # 4. error multiset
    sim_errors = _errors_multiset((u, k) for u, k in sim.errors)
    eng_errors = _errors_multiset(
        (r["url"], r["kind"]) for r in eng.errors().collect())
    assert eng_errors == sim_errors, "error multiset mismatch"

    # 5. batch/metrics parity: fetched + new-link counts per batch,
    #    plus per-batch cache-hit counts when the cache is on
    sim_m = [(m["batch"], m["fetched"], m["new_links"], m.get("cache_hits"),
              m.get("revalidated"))
             for m in sim.metrics]
    eng_m = [(m["batch"], m["fetched"], m["new_links"], m.get("cache_hits"),
              m.get("revalidated"))
             for m in eng.metrics]
    assert eng_m == sim_m, "per-batch metrics mismatch"

    # 6. ctx propagation: referer (extensions/referer.go), per-request
    #    UA (RandomUserAgent pool), round-robin proxy (proxy.go:27-58),
    #    and the generic request Context (context.go:22-88, inherited
    #    by descendants per request.go:151-153)
    sim_ref = {(t[1], t[8], t[9], t[10], t[11]) for t in sim.trace}
    eng_ref = {(r["seq"], r["referer"], r["ua"], r["proxy"], r["ctx"])
               for r in eng.trace().collect()}
    assert eng_ref == sim_ref, "referer/ua/proxy/ctx mismatch"


def test_images_validated(spark, corpus_pd, corpus_spark, tmp_state):
    """Direct image fetches must pass decoded-pixel validation (exact
    for png, PSNR≥40dB for the lossy stand-in) and page-embedded
    (image, caption) pairs must match the simulator + payload table."""
    cfg = CrawlConfig(max_depth=0, ignore_robots=True)
    seeds = ["http://d00.test/"]
    sim, eng = _run_both(spark, corpus_pd, corpus_spark, cfg, seeds, tmp_state)

    img_df = eng.images().collect()
    direct = [(r["image_url"], r["image_id"], r["ok"], r["psnr_db"])
              for r in img_df if r["image_id"] is not None]
    assert direct, "no direct image fetches in scenario"
    assert all(ok for _, _, ok, _ in direct), "image validation failed"
    assert all(p >= 40.0 for _, _, _, p in direct), "PSNR below 40 dB"

    sim_pairs = {(p, u, c) for p, u, _i, c in sim.images if p is not None}
    eng_pairs = {(r["page_url"], r["image_url"], r["caption"])
                 for r in img_df if r["page_url"] is not None}
    assert eng_pairs == sim_pairs, "page (image, caption) pairs mismatch"

    # caption equality against the payload table (input_hint invariant)
    captions = {r["image_id"]: r["caption"] for r in corpus_spark["images"].collect()}
    by_id = {}
    for _p, url, _i, c in sim.images:
        if c is not None:
            iid = url.rsplit("/", 1)[-1].split(".")[0]
            by_id[iid] = c
    for iid, cap in by_id.items():
        assert captions[iid] == cap, f"caption mismatch for {iid}"


def test_resume_byte_identical(spark, corpus_pd, corpus_spark, tmp_state):
    """Kill/resume: run N batches, stop, resume in a fresh Crawler →
    outputs identical to an uninterrupted run (north_rule)."""
    import shutil
    import tempfile

    cfg = CrawlConfig(
        max_depth=3, ignore_robots=True,
        limit_rules=(LimitRule(domain_glob="*", delay_ms=200, parallelism=1),))
    seeds = ["http://d00.test/", "http://d01.test/"]

    full_state = tempfile.mkdtemp(prefix="colly_full_")
    try:
        full = Crawler(spark, corpus_spark, cfg, full_state,
                       bloom_threshold_rows=0).run(seeds)
        full_trace = sorted(
            (r["batch"], r["seq"], r["url"], r["final_url"], r["status"])
            for r in full.trace().collect())
        full_seen = _engine_seen(full)

        # interrupted: stop after 2 batches, then resume with a NEW engine
        Crawler(spark, corpus_spark, cfg, tmp_state,
                bloom_threshold_rows=0).run(seeds, max_batches=2)
        resumed = Crawler(spark, corpus_spark, cfg, tmp_state,
                          bloom_threshold_rows=0).run(resume=True)
        res_trace = sorted(
            (r["batch"], r["seq"], r["url"], r["final_url"], r["status"])
            for r in resumed.trace().collect())
        assert res_trace == full_trace, "resumed trace differs from uninterrupted run"
        assert _engine_seen(resumed) == full_seen, "resumed seen-set differs"
    finally:
        shutil.rmtree(full_state, ignore_errors=True)


def test_resume_mid_retry_loop(spark, corpus_pd, corpus_spark, tmp_state):
    """Kill/resume inside an active retry loop: the retry columns
    (no_revisit, tries, body_req) must survive the frontier snapshot —
    a resumed engine finishes the remaining attempts exactly like an
    uninterrupted run."""
    import shutil
    import tempfile

    cfg = CrawlConfig(max_depth=1, ignore_robots=True,
                      retry_http_statuses=(500,), max_retries=3)
    seeds = ["http://d00.test/500", "http://d00.test/"]

    full_state = tempfile.mkdtemp(prefix="colly_full_")
    try:
        full = Crawler(spark, corpus_spark, cfg, full_state,
                       bloom_threshold_rows=0).run(seeds)
        full_trace = sorted(
            (r["batch"], r["seq"], r["url"], r["final_url"], r["status"])
            for r in full.trace().collect())
        # 1 fresh + 3 retries of /500 plus the normal seed
        assert sum(1 for t in full_trace if t[2].endswith("/500")) == 4

        # stop after batch 1 (one retry still owed), resume fresh
        Crawler(spark, corpus_spark, cfg, tmp_state,
                bloom_threshold_rows=0).run(seeds, max_batches=2)
        resumed = Crawler(spark, corpus_spark, cfg, tmp_state,
                          bloom_threshold_rows=0).run(resume=True)
        res_trace = sorted(
            (r["batch"], r["seq"], r["url"], r["final_url"], r["status"])
            for r in resumed.trace().collect())
        assert res_trace == full_trace, "resumed retry trace differs"
    finally:
        shutil.rmtree(full_state, ignore_errors=True)
