import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("colly-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        # cap UI/status-store retention: the driver loop issues many
        # jobs with deep plans; retained plan strings otherwise dominate
        # the heap over a long pytest session
        .config("spark.sql.ui.retainedExecutions", "10")
        .config("spark.ui.retainedJobs", "50")
        .config("spark.ui.retainedStages", "50")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture()
def tmp_state():
    d = tempfile.mkdtemp(prefix="colly_state_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def corpus_pd():
    from colly_spark.sources.fixtures import CorpusSpec, make_corpus

    return make_corpus(CorpusSpec(seed=42, n_domains=4, base_pages_per_domain=8))


@pytest.fixture(scope="session")
def corpus_spark(spark, corpus_pd):
    from colly_spark.plans.util import to_spark_corpus

    return to_spark_corpus(spark, corpus_pd)
