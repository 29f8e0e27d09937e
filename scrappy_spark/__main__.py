"""CLI — the `bin/scrappy` surface (bin/scrappy:30-47) on Spark.

Flag parity (reference flag → here):
    -g/--get URI        crawl starting at URI, print serialized triples
                        (bin/scrappy:33 → agent proxy; here the crawl
                        engine via the service facade)
    -l/--levels L       crawl depth, default -1 = infinite (bin/scrappy:42,27)
    -d/--delay D        politeness: reference forces workers=1 (global
                        serialization, bin/scrappy:41); here the
                        generalized per-host budget of 1 with the delay
                        recorded in round manifests
    -c/--concurrence C  reference worker threads (bin/scrappy:40) → Spark
                        local parallelism (local[C])
    -f/--format FMT     ntriples | json | ejson | rdfxml | yarf (bin/scrappy:44,199)
    -r/--reference      referenceable provenance output (bin/scrappy:43,212)
    -o/--observe URIs   comma-separated watch list: one observe tick
                        (agent.rb:140-151; scheduling belongs to cron /
                        Structured Streaming triggers)
    --web PATH          the documents parquet table that plays the web
                        (sandbox stand-in for live HTTP; S-1)
    --store DIR         checkpoint store root (resumable)

Example:
    python -m scrappy_spark --web /data/documents.parquet \
        -g http://h000.example.com/ -l 2 -f ntriples
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="scrappy_spark", description=__doc__)
    p.add_argument("-g", "--get", metavar="URI", help="crawl seed URI")
    p.add_argument("-l", "--levels", type=int, default=-1)
    p.add_argument("-d", "--delay", type=int, default=0, metavar="MS")
    p.add_argument("-c", "--concurrence", type=int, default=None)
    p.add_argument(
        "-f", "--format", default="ntriples", choices=("ntriples", "json", "ejson", "rdfxml", "yarf")
    )
    p.add_argument(
        "-r",
        "--reference",
        action="store_true",
        help="output referenceable provenance (sc:UnivocalSelector graph)",
    )
    p.add_argument("-o", "--observe", metavar="URIS")
    p.add_argument("-t", "--time", type=int, default=15, metavar="MINUTES")
    p.add_argument("--web", required=True, metavar="PARQUET")
    p.add_argument("--store", default=None)
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    import tempfile

    from .frontier import CrawlConfig
    from .session import get_spark
    from .sources.server import ScrappyService

    if spark is None:
        master = (
            f"local[{args.concurrence}]" if args.concurrence else None
        )
        spark = get_spark("scrappy-cli", master=master)
    web = spark.read.parquet(args.web)
    store = args.store or tempfile.mkdtemp(prefix="scrappy_cli_")

    if args.get:
        cfg = CrawlConfig(
            depth=args.levels,
            politeness_delay_ms=args.delay,
            per_host_budget=1 if args.delay else None,
        )
        svc = ScrappyService(spark, web, store, cfg, referenceable=args.reference)
        resp = svc.process_request(args.format, args.get)
        if resp.status != "ok":
            print(f"error: {resp.status} ({resp.uri})", file=sys.stderr)
            return 1
        print(resp.output)
        return 0

    if args.observe:
        import time as _time

        from .sources.repository import Repository
        from .streaming.observe import Observer

        repo = Repository(spark, f"{store}/repo", window_seconds=args.time * 60)
        obs = Observer(
            spark, web, repo, args.observe.split(","),
            CrawlConfig(depth=0),
        )
        print(obs.tick(now=int(_time.time())))
        return 0

    build_parser().print_help()
    return 2


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
