"""Freshness-driven revisit scheduling
(operators/politeness.recrawl_schedule, Cho & Garcia-Molina 2003):
hand-computed estimator KATs; the oracle gate is
test_entry_oracle[recrawl_schedule]."""

import math

from colly_spark.operators.politeness import recrawl_schedule


def _run(spark, rows):
    df = spark.createDataFrame(rows, "url_hash long, changed boolean")
    return {r.url_hash: r.asDict()
            for r in recrawl_schedule(df).collect()}


def test_estimator_kats(spark):
    # page 1: 4 obs, 2 changes -> lam = -ln(2.5/4.5)
    # page 2: 3 obs, 0 changes -> lam = -ln(3.5/3.5) = 0, interval NULL
    # page 3: 2 obs, 2 changes -> lam = -ln(0.5/2.5) (finite at X=n)
    rows = ([(1, True), (1, False), (1, True), (1, False)]
            + [(2, False)] * 3
            + [(3, True), (3, True)])
    got = _run(spark, rows)
    assert got[1]["n_obs"] == 4 and got[1]["n_changed"] == 2
    lam1 = round(-math.log(2.5 / 4.5), 9)
    assert got[1]["lambda_hat"] == lam1
    assert got[1]["revisit_interval"] == round(1.0 / lam1, 6)
    assert got[2]["lambda_hat"] == 0.0
    assert got[2]["revisit_interval"] is None
    lam3 = round(-math.log(0.5 / 2.5), 9)
    assert got[3]["lambda_hat"] == lam3


def test_faster_changing_pages_revisit_sooner(spark):
    rows = ([(1, True)] * 5 + [(1, False)]          # hot: 5/6
            + [(2, True)] + [(2, False)] * 5)       # cold: 1/6
    got = _run(spark, rows)
    assert got[1]["revisit_interval"] < got[2]["revisit_interval"]
