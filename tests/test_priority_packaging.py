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


_SUBMIT_JOB = '''\
"""Crawl job for the spark-submit --py-files contract test: imports
scrappy_spark ONLY from the shipped zip (no repo path anywhere)."""
import tempfile

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.appName("pyfiles-e2e")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from scrappy_spark.corpus import CorpusConfig, generate_df, seeds_for
from scrappy_spark.frontier import Crawler, CrawlConfig

cfg = CorpusConfig(n_docs=150)
web = generate_df(spark, cfg, partitions=4).persist()
web.count()
store = tempfile.mkdtemp(prefix="submit_crawl_")
crawler = Crawler(spark, web, store, CrawlConfig(depth=1))
stats = crawler.run(seeds_for(cfg, 4))
print("SUBMIT_RESULT popped=%d rounds=%d" % (stats["popped"], stats["rounds"]))
spark.stop()
'''


def test_spark_submit_pyfiles_multi_executor(tmp_path):
    """The north rule's deployment contract end-to-end: `spark-submit
    --py-files <zip>` onto a MULTI-EXECUTOR master (local-cluster — two
    separate executor JVMs whose Python workers must import the package
    from the shipped zip). cwd is a scratch dir and PYTHONPATH is
    scrubbed, so the zip is the ONLY way scrappy_spark can resolve —
    on driver and on every executor."""
    import os

    import pyspark

    import package

    zip_path = package.build(str(tmp_path / "scrappy_spark.zip"))
    job = tmp_path / "job.py"
    job.write_text(_SUBMIT_JOB)
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [
            submit,
            "--master",
            "local-cluster[2,2,2048]",
            "--driver-memory",
            "2g",
            "--py-files",
            zip_path,
            str(job),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),
        env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("SUBMIT_RESULT")]
    assert line, r.stdout[-2000:]
    popped = int(line[0].split("popped=")[1].split()[0])
    assert popped > 0


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
