"""Environment configuration (env.go NewEnvFromMap + config.go EnvMap):
prefix filtering, key-translation dictionary, setter parity, and the
logError-and-skip behavior for unknown keys / bad values."""

from __future__ import annotations

from colly_spark.config import CrawlConfig


def test_from_env_setters():
    cfg = CrawlConfig.from_env(env={
        "COLLY_ALLOWED_DOMAINS": "a.test,b*.test",
        "COLLY_DISALLOWED_DOMAINS": "c.test",
        "COLLY_USER_AGENT": "custom-ua/2.0",
        "COLLY_IGNORE_ROBOTSTXT": "false",
        "COLLY_FOLLOW_REDIRECTS": "0",
        "COLLY_MAX_BODY_SIZE": "4096",
        "COLLY_MAX_DEPTH": "5",
        "COLLY_MAX_REVISIT": "2",
        "COLLY_PARSE_HTTP_ERROR_RESPONSE": "yes",
        "COLLY_CACHE_DIR": "/anywhere",
        "UNPREFIXED": "ignored",
    })
    assert cfg.allowed_domain_globs == ("a.test", "b*.test")
    assert cfg.disallowed_domain_globs == ("c.test",)
    assert cfg.user_agent == "custom-ua/2.0"
    assert cfg.ignore_robots is False
    assert cfg.follow_redirects is False
    assert cfg.max_body_size == 4096
    assert cfg.max_depth == 5
    assert cfg.max_revisits == 2
    assert cfg.parse_error_response is True
    assert cfg.cache_enabled is True


def test_from_env_prefix_and_dict():
    # NewEnvFromMap: keys filtered by prefix, then translated by dict
    cfg = CrawlConfig.from_env(
        env={"APP_DEPTH": "3", "APP_MAX_BODY_SIZE": "100", "OTHER_MAX_DEPTH": "9"},
        prefix="APP_", dict_map={"DEPTH": "MAX_DEPTH"})
    assert cfg.max_depth == 3
    assert cfg.max_body_size == 100


def test_from_env_warn_and_skip():
    warnings = []
    cfg = CrawlConfig.from_env(
        env={"COLLY_MAX_DEPTH": "not-an-int", "COLLY_NO_SUCH_KEY": "x",
             "COLLY_IGNORE_ROBOTSTXT": "maybe", "COLLY_USER_AGENT": "ok"},
        warn=warnings.append)
    # bad values / unknown keys warned and skipped, good ones applied
    assert cfg.max_depth == 0 and cfg.ignore_robots is True
    assert cfg.user_agent == "ok"
    assert len(warnings) == 3


def test_from_env_base_override():
    base = CrawlConfig(max_depth=7, user_agent="base-ua")
    cfg = CrawlConfig.from_env(env={"COLLY_MAX_DEPTH": "2"}, base=base)
    assert cfg.max_depth == 2         # env wins over base
    assert cfg.user_agent == "base-ua"  # untouched fields kept
