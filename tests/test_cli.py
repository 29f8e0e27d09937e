"""CLI surface (bin/scrappy:30-47 parity): -g crawl+serialize, format
selection, error paths, observe tick."""

import json

from scrappy_spark.__main__ import main
from scrappy_spark.corpus import CorpusConfig, generate_df, seeds_for


def _web_path(spark, tmp_path):
    path = str(tmp_path / "web.parquet")
    generate_df(spark, CorpusConfig(n_docs=60), partitions=2).write.parquet(path)
    return path


def test_cli_get_ntriples(spark, tmp_path, capsys):
    web = _web_path(spark, tmp_path)
    seed = seeds_for(CorpusConfig(n_docs=60), 1)[0]
    rc = main(
        ["--web", web, "-g", seed, "-l", "1", "-f", "ntriples",
         "--store", str(tmp_path / "s1")],
        spark=spark,
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "<sc:references>" in out and out.strip().endswith(".")


def test_cli_get_json_and_error(spark, tmp_path, capsys):
    web = _web_path(spark, tmp_path)
    seed = seeds_for(CorpusConfig(n_docs=60), 1)[0]
    rc = main(
        ["--web", web, "-g", seed, "-l", "0", "-f", "json",
         "--store", str(tmp_path / "s2")],
        spark=spark,
    )
    assert rc == 0
    rows = json.loads(capsys.readouterr().out)
    assert isinstance(rows, list) and all("s" in r for r in rows)

    rc = main(
        ["--web", web, "-g", "http://nonexistent.example/", "-f", "json",
         "--store", str(tmp_path / "s3")],
        spark=spark,
    )
    assert rc == 1
    assert "error" in capsys.readouterr().err


def test_cli_observe_tick(spark, tmp_path, capsys):
    web = _web_path(spark, tmp_path)
    seed = seeds_for(CorpusConfig(n_docs=60), 1)[0]
    rc = main(
        ["--web", web, "-o", seed, "--store", str(tmp_path / "s4")],
        spark=spark,
    )
    assert rc == 0
    assert "'stale': 1" in capsys.readouterr().out


def test_cli_reference_flag(spark, tmp_path, capsys):
    """-r (bin/scrappy:43): the response carries the provenance graph."""
    web = _web_path(spark, tmp_path)
    seed = seeds_for(CorpusConfig(n_docs=60), 1)[0]
    rc = main(
        ["-g", seed, "-l", "1", "-r", "--web", web,
         "--store", str(tmp_path / "store_r")],
        spark=spark,
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "sc:UnivocalSelector" in out and "<sc:source>" in out
