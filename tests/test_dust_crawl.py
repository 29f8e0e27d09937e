"""DUST-in-the-crawl golden (ninth wave): session-id aliases are mined
into rewrite rules, the rules feed CrawlConfig.dust_rules, and the crawl
then unifies alias families WITHOUT fetching them — crawl order and seen
set match the pure-python oracle exactly, alias URLs never enter the
seen set, and the layer is non-vacuous (removing it changes the crawl
and fetches the duplicates)."""

from pyspark.sql import Row

from scrappy_spark.corpus import (
    DOCUMENTS_SCHEMA,
    CorpusConfig,
    generate_local,
    seeds_for,
)
from scrappy_spark.frontier import Crawler, CrawlConfig
from scrappy_spark.frontier import dust
from scrappy_spark.oracle import dust_rewrite, oracle_crawl

CFG = CorpusConfig(n_docs=120)


def _span(kind, text="", href="", off=0):
    return {"kind": kind, "text": text, "media_ref": href, "offset": off}


def _build():
    """Base corpus + session-id aliases: 18 canonical pages each gain an
    alias URL serving IDENTICAL spans, and links to the ALIASES are
    injected into other pages so the crawl discovers them."""
    docs = dict(generate_local(CFG))
    canonicals = sorted(docs)[10:46:2]  # 18 deterministic targets
    aliases = {}
    for i, canon in enumerate(canonicals):
        alias = f"{canon}?session=s{i % 3}"
        docs[alias] = docs[canon]  # identical content = same fingerprint
        aliases[alias] = canon
    # inject alias links into 18 OTHER pages (one alias link each)
    carriers = sorted(d for d in docs if d not in aliases)[60:96:2]
    for carrier, alias in zip(carriers, aliases):
        spans = list(docs[carrier])
        spans.append(_span("link", "alias link", alias, off=len(spans)))
        docs[carrier] = spans
    return docs, aliases


def test_dust_crawl_matches_oracle_and_never_fetches_aliases(
    spark, tmp_path
):
    docs, aliases = _build()
    df = spark.createDataFrame(list(docs.items()), DOCUMENTS_SCHEMA)

    # mine the rules from content equality (fingerprint = canonical id)
    fp = spark.createDataFrame(
        [Row(fingerprint=c, uri=u) for u, c in aliases.items()]
        + [Row(fingerprint=c, uri=c) for c in aliases.values()]
    )
    mined = dust.dust_rules(dust.duplicate_url_pairs(fp))
    cfg_rules = dust.rules_for_config(mined)
    assert set(cfg_rules) == {
        (f"?session=s{k}", "") for k in range(3)
    }, cfg_rules

    seeds = seeds_for(CFG, 2)
    kw = dict(depth=3, per_host_budget=3, max_rounds=12)
    golden = oracle_crawl(
        docs, seeds, dust_rules=list(cfg_rules), **kw
    )
    crawler = Crawler(
        spark,
        df,
        str(tmp_path / "store"),
        CrawlConfig(dust_rules=cfg_rules, **kw),
    )
    crawler.run(seeds)
    order = [
        (r["seq"], r["uri"], r["depth"])
        for r in crawler.order_df().orderBy("round", "seq").collect()
    ]
    assert order == golden.order
    seen = {(r["uri"], r["depth"]) for r in crawler.seen_df().collect()}
    assert seen == golden.seen

    # no alias URL is ever seen or fetched under the rules
    assert not any("?session=" in u for u, _ in golden.seen)
    assert not any("?session=" in u for u in golden.fetches)

    # non-vacuity: without the rules the crawl differs and at least one
    # alias is fetched as a separate page
    bare = oracle_crawl(docs, seeds, **kw)
    assert bare.order != golden.order
    assert any("?session=" in u for u, _ in bare.seen)

    # the rewrite itself is the shared spec: python == config semantics
    a = next(iter(aliases))
    assert dust_rewrite(a, cfg_rules) == aliases[a]


def test_dust_crawl_empty_src_rule_fails_loud(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="non-empty src"):
        Crawler(
            spark,
            spark.createDataFrame([], DOCUMENTS_SCHEMA),
            str(tmp_path / "s"),
            CrawlConfig(dust_rules=(("", "x"),)),
        )
