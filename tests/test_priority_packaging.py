"""Priority-queue pops + --py-files packaging."""

import subprocess
import sys
import zipfile

from pyspark.sql import functions as F

from scrappy_spark.corpus import CorpusConfig, generate_df, seeds_for
from scrappy_spark.frontier import Crawler, CrawlConfig


def test_priority_expr_reorders_budgeted_pops(spark, tmp_path):
    """With priority '-depth' (deepest first) under a host budget, early
    rounds pop deeper items before shallower ones on contended hosts —
    and the crawl still terminates with the same seen set as FIFO."""
    cfg = CorpusConfig(n_docs=120)
    df = generate_df(spark, cfg, partitions=2).persist()
    df.count()
    seeds = seeds_for(cfg, 2)

    fifo = Crawler(
        spark, df, str(tmp_path / "fifo"), CrawlConfig(depth=2, per_host_budget=2)
    )
    fifo.run(seeds)
    pri = Crawler(
        spark,
        df,
        str(tmp_path / "pri"),
        CrawlConfig(depth=2, per_host_budget=2, priority_expr="-depth"),
    )
    pri.run(seeds)

    fifo_seen = {(r["uri"], r["depth"]) for r in fifo.seen_df().collect()}
    pri_seen = {(r["uri"], r["depth"]) for r in pri.seen_df().collect()}
    # seen-set closure is schedule-independent
    assert fifo_seen == pri_seen

    # the schedules themselves differ (priority had an effect)
    fifo_order = [
        (r["round"], r["seq"]) for r in fifo.order_df().orderBy("round", "seq").collect()
    ]
    pri_order = [
        (r["round"], r["seq"]) for r in pri.order_df().orderBy("round", "seq").collect()
    ]
    assert fifo_order != pri_order

    # within any round, a host never exceeds its budget (politeness holds)
    per = (
        pri.order_df()
        .withColumn("host", F.regexp_extract("uri", r"^[^:]+://([^/?#:]*)", 1))
        .groupBy("round", "host")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per <= 2


def test_pyfiles_zip_importable(tmp_path):
    import package

    out = package.build(str(tmp_path / "scrappy_spark.zip"))
    with zipfile.ZipFile(out) as z:
        names = z.namelist()
    assert "scrappy_spark/frontier/crawler.py" in names
    assert not any("__pycache__" in n or "tests/" in n for n in names)

    # import the package from the zip alone in a clean interpreter
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import scrappy_spark, scrappy_spark.frontier, scrappy_spark.extractor; "
        "print(scrappy_spark.__version__)"
    )
    r = subprocess.run(
        [sys.executable, "-c", code, out], capture_output=True, text=True, timeout=60
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip()
