"""Cross-engine tokenizer equivalence on randomized inputs:

  Spark SQL expression (sqltok.tokens_col)
  == DuckDB SQL expression (sqltok.duckdb_tokens_sql)
  == pure-Python reference pipeline (textproc), for tag-free text

This is the load-bearing assumption of the DuckDB correctness gate:
the oracle tokenizer must mean exactly what the engine's tokenizer
means."""

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from eaststorm_searchengine_spark import textproc
from eaststorm_searchengine_spark.functions import sqltok

_ALPHABET = (
    string.ascii_letters + string.digits + "     \t\n"
    + ".,;:!?'\"()[]{}-_/\\@#$%^&*+=~`|<>"
    + "éàüßñ中日"
)


def _random_texts(n: int, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        ln = rng.randint(0, 200)
        out.append("".join(rng.choice(_ALPHABET) for _ in range(ln)))
    # targeted cases
    out += [
        "",
        "   ",
        "plain lower words",
        "UPPER CASE WORDS",
        "url https://x.com/path?q=1 tail",
        "HTTPS://CAPS.COM/X tail",
        "x" * 31 + " ok " + "y" * 30,
        "digits 123 mix a1b2 end",
        "nbsp separated words",  #   is NOT Java \s
        "tab\tand\x0bvertical\x0cfeeds",
        "don't split's apostrophes",
    ]
    return out


def test_three_way_tokenizer_equivalence(spark):
    texts = _random_texts(300)
    # texts with '<' would diverge (python extract_text strips tags);
    # the SQL gate applies to tag-free text only — keep the domain honest
    texts = [t.replace("<", "(").replace(">", ")") for t in texts]

    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    spark_toks = {
        r["i"]: list(r["toks"])
        for r in sdf.select("i", sqltok.tokens_col(F.col("t")).alias("toks")).collect()
    }

    con = duckdb.connect()
    con.register("texts", __import__("pandas").DataFrame({"i": range(len(texts)), "t": texts}))
    duck_toks = {
        int(i): list(v)
        for i, v in con.sql(
            f"SELECT i, {sqltok.duckdb_tokens_sql('t')} AS toks FROM texts"
        ).fetchall()
    }

    py_toks = {
        i: textproc.tokenize(textproc.extract_text(t)) for i, t in enumerate(texts)
    }

    for i, t in enumerate(texts):
        assert spark_toks[i] == duck_toks[i], f"spark!=duck for {t!r}"
        assert spark_toks[i] == py_toks[i], f"spark!=python for {t!r}"
