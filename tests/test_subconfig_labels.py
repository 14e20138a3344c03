"""P3: v3 labeled SubConfig semantics (config.go:93-105, 219-230;
labeled/removable filters filter.go:81-154) — label lookup, per-label
override, removal; first-match-wins order preserved throughout."""

from colly_spark.config import CrawlConfig, LimitRule


def _cfg():
    return CrawlConfig(limit_rules=(
        LimitRule(domain_glob="hot.*", delay_ms=500, parallelism=1, label="hot"),
        LimitRule(domain_glob="*.img.test", delay_ms=100, parallelism=4, label="img"),
        LimitRule(domain_glob="*", delay_ms=0, parallelism=8, label="default"),
    ))


def test_label_lookup():
    cfg = _cfg()
    assert cfg.rule_by_label("img").parallelism == 4
    assert cfg.rule_by_label("nope") is None


def test_override_changes_only_labeled_rule():
    cfg = _cfg().with_rule_override("hot", delay_ms=1000, parallelism=2)
    assert cfg.rule_by_label("hot").delay_ms == 1000
    assert cfg.rule_by_label("hot").parallelism == 2
    assert cfg.rule_by_label("img").delay_ms == 100  # untouched
    # original config unchanged (frozen semantics)
    assert _cfg().rule_by_label("hot").delay_ms == 500


def test_override_affects_quota():
    cfg = _cfg()
    # hot.test matches 'hot': quota = 1*1000/(20+500) = 1
    assert cfg.domain_quota("hot.test") == 1
    faster = cfg.with_rule_override("hot", delay_ms=0, parallelism=10)
    # 10*1000/20 = 500
    assert faster.domain_quota("hot.test") == 500


def test_removal_falls_through_to_next_match():
    cfg = _cfg().without_rule("hot")
    # hot.test now falls through to the '*' default rule
    assert cfg.matching_rule("hot.test").label == "default"
    assert len(cfg.limit_rules) == 2


def test_first_match_wins_order_kept():
    cfg = _cfg()
    assert cfg.matching_rule("a.img.test").label == "img"
    cfg2 = cfg.with_rule_override("img", delay_ms=999)
    # override preserves position: img still shadows the default rule
    assert cfg2.matching_rule("a.img.test").delay_ms == 999
