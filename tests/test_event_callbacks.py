"""KATs for the v3 EventCallbacks registry (event.go:11-364),
re-expressing the behavioral families of event_test.go:12-3188, plus
the Spark bridge's firing-order contract (collector.go:279-301)."""

from __future__ import annotations

import pytest

from colly_spark.operators.callbacks import (_MAX_INT, NO_ARG, ON_HTML,
                                             ON_REQUEST, EventCallbacks,
                                             apply_on_html, on_html_plan)


def seeded():
    """The recurring event_test.go fixture: keys {6,42,200,7,99} whose
    sorted firing order is six,seven,forty-two,ninety-nine,two hundred."""
    cbs = EventCallbacks()
    for k, v in [(6, "six"), (42, "forty-two"), (200, "two hundred"),
                 (7, "seven"), (99, "ninety-nine")]:
        cbs.add(10, "arg_2", v, index=k)
    return cbs


class TestAdd:
    def test_append_to_empty_arg_gets_key_zero(self):
        # event_test.go "append to empty arg"
        cbs = seeded()
        cbs.add(10, "arg_1", "sixty-nine")
        assert cbs.get_arg(10, "arg_1") == ["sixty-nine"]
        assert cbs.count(10) == 6

    def test_append_after_max_key(self):
        # append lands at max(keys)+1 (event.go:288-296)
        cbs = seeded()
        cbs.add(10, "arg_2", "appended")
        assert cbs.get_arg(10, "arg_2")[-1] == "appended"
        assert cbs.count(10, "arg_2") == 6

    def test_append_blocked_by_maxint_slot(self):
        # a MaxInt slot blocks appends (event.go:284-286)
        cbs = EventCallbacks()
        cbs.add(10, "a", "pinned-last", index=_MAX_INT)
        cbs.add(10, "a", "ignored")
        assert cbs.get_arg(10, "a") == ["pinned-last"]
        assert cbs.count(10) == 1

    def test_set_overwrites_without_count_change(self):
        # Add with an existing index overwrites in place (event.go:56-58)
        cbs = seeded()
        cbs.add(10, "arg_2", "SEVEN", index=7)
        assert cbs.get_arg(10, "arg_2") == [
            "six", "SEVEN", "forty-two", "ninety-nine", "two hundred"]
        assert cbs.count(10) == 5

    def test_sorted_firing_order(self):
        assert seeded().get_arg(10, "arg_2") == [
            "six", "seven", "forty-two", "ninety-nine", "two hundred"]

    def test_negative_positions_fire_first(self):
        cbs = EventCallbacks()
        cbs.add(1, NO_ARG, "late")           # key 0
        cbs.add(1, NO_ARG, "early", index=-5)
        cbs.add(1, NO_ARG, "appended")       # max(0,-5)+1 = 1
        assert cbs.get_arg(1, NO_ARG) == ["early", "late", "appended"]


class TestRemove:
    def test_remove_whole_arg(self):
        cbs = seeded()
        cbs.add(10, "other", "x")
        cbs.remove(10, "arg_2")
        assert cbs.get_arg(10, "arg_2") == []
        assert cbs.count(10) == 1
        assert not cbs.is_empty(10)

    def test_remove_specific_keys(self):
        cbs = seeded()
        cbs.remove(10, "arg_2", 42, 200)
        assert cbs.get_arg(10, "arg_2") == ["six", "seven", "ninety-nine"]
        assert cbs.count(10) == 3

    def test_remove_missing_key_is_noop(self):
        cbs = seeded()
        cbs.remove(10, "arg_2", 12345)
        cbs.remove(10, "no_such_arg")
        cbs.remove(99, "arg_2")
        assert cbs.count(10) == 5


class TestCountIsEmpty:
    def test_count_scopes(self):
        cbs = seeded()
        cbs.add(10, "arg_1", "a")
        cbs.add(20, "x", "b")
        assert cbs.count(10) == 6
        assert cbs.count(10, "arg_1") == 1
        assert cbs.count(10, "arg_1", "arg_2") == 6
        assert cbs.count(10, "missing") == 0
        assert cbs.count(77) == 0

    def test_is_empty(self):
        cbs = EventCallbacks()
        assert cbs.is_empty(ON_HTML)
        cbs.add(ON_HTML, "a[href]", {"name": "links"})
        assert not cbs.is_empty(ON_HTML)
        assert cbs.is_empty(ON_HTML, "img[src]")
        cbs.remove(ON_HTML, "a[href]")
        assert cbs.is_empty(ON_HTML)

    def test_get_skips_emptied_args(self):
        # getAll only returns non-empty args (event.go:209-223)
        cbs = seeded()
        cbs.add(10, "hollow", "x", index=3)
        cbs.remove(10, "hollow", 3)
        assert set(cbs.get(10)) == {"arg_2"}


_HTML = """
<html><body>
  <a href="/one">first</a>
  <div class="c"><a href="/two">second</a></div>
  <img src="/i.png">
</body></html>
"""


class TestSparkBridge:
    def test_plan_preserves_registration_and_position_order(self):
        cbs = EventCallbacks()
        cbs.add(ON_HTML, "a[href]", {"name": "txt", "kind": "text"})
        cbs.add(ON_HTML, "img[src]", {"name": "src", "kind": "attr", "attr": "src"})
        cbs.add(ON_HTML, "a[href]",
                {"name": "href_first", "kind": "attr", "attr": "href"}, index=-1)
        assert on_html_plan(cbs) == [
            ("a[href]", [{"name": "href_first", "kind": "attr", "attr": "href"},
                         {"name": "txt", "kind": "text"}]),
            ("img[src]", [{"name": "src", "kind": "attr", "attr": "src"}]),
        ]

    def test_firing_order_rows(self, spark):
        cbs = EventCallbacks()
        cbs.add(ON_HTML, "a[href]", {"name": "txt", "kind": "text"})
        cbs.add(ON_HTML, "a[href]",
                {"name": "href", "kind": "attr", "attr": "href"}, index=-1)
        cbs.add(ON_HTML, "img[src]", {"name": "src", "kind": "attr", "attr": "src"})
        df = spark.createDataFrame([("p1", _HTML)], "url string, body string")
        rows = [tuple(r) for r in
                apply_on_html(df, cbs).orderBy("fire_seq").collect()]
        assert rows == [
            # selector 1 (a[href]), element 0: callbacks by position (-1 then 0)
            ("p1", 0, "a[href]", 0, "href", "/one"),
            ("p1", 1, "a[href]", 0, "txt", "first"),
            # element 1 with running index
            ("p1", 2, "a[href]", 1, "href", "/two"),
            ("p1", 3, "a[href]", 1, "txt", "second"),
            # selector 2 in registration order
            ("p1", 4, "img[src]", 0, "src", "/i.png"),
        ]

    def test_detach_changes_program(self, spark):
        # OnHTMLDetach(selector) removes all callbacks for it
        # (collector.go:258-260)
        cbs = EventCallbacks()
        cbs.add(ON_HTML, "a[href]", {"name": "txt"})
        cbs.add(ON_HTML, "img[src]", {"name": "src", "kind": "attr", "attr": "src"})
        cbs.remove(ON_HTML, "a[href]")
        df = spark.createDataFrame([("p1", _HTML)], "url string, body string")
        rows = apply_on_html(df, cbs).collect()
        assert {r.selector for r in rows} == {"img[src]"}

    def test_request_event_registry_shared_shape(self):
        # NO_ARG events use the same list (collector.go:91-97)
        cbs = EventCallbacks()
        cbs.add(ON_REQUEST, NO_ARG, "ua-setter", index=5)
        cbs.add(ON_REQUEST, NO_ARG, "abort-checker", index=1)
        assert cbs.get_arg(ON_REQUEST, NO_ARG) == ["abort-checker", "ua-setter"]
