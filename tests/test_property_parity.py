"""Property-based parity (hypothesis): the Spark implementations and the
serial spec implementations agree on arbitrary inputs — scrub chain
byte-identity, word n-grams, tokenization, langid. One Spark round-trip
per property (whole batch of examples in a single DataFrame)."""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from inspectehr_spark.functions.textfns import word_ngrams
from inspectehr_spark.pipeline import reference, spec
from inspectehr_spark.pipeline.scrub import scrub_text

# printable-ASCII + spaces + a few unicode letters the corpus uses
TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " .@-+%_#ü é",
    min_size=0,
    max_size=120,
)


def _batch(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")


@settings(max_examples=3, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=200))
def test_scrub_byte_parity(spark, texts):
    df = _batch(spark, texts)
    got = {r["i"]: r["s"] for r in df.select("i", scrub_text("text").alias("s")).collect()}
    for i, t in enumerate(texts):
        assert got[i].encode() == reference.scrub_serial(t).encode(), repr(t)


@settings(max_examples=3, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=200))
def test_word_ngrams_parity(spark, texts):
    df = _batch(spark, texts).withColumn(
        "_toks", F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    )
    got = {
        r["i"]: r["g"]
        for r in df.select("i", word_ngrams(F.col("_toks"), 3).alias("g")).collect()
    }
    for i, t in enumerate(texts):
        toks = spec.tokenize_py(t)
        expect = [" ".join(toks[j : j + 3]) for j in range(max(0, len(toks) - 2))]
        assert got[i] == expect, repr(t)


@settings(max_examples=3, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=150))
def test_langid_udf_matches_serial(spark, texts):
    from inspectehr_spark.pipeline.models import langid_udf

    df = _batch(spark, texts)
    got = {r["i"]: r["l"] for r in df.select("i", langid_udf("text").alias("l")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == reference.langid_serial(t), repr(t)


@settings(max_examples=3, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=150))
def test_perplexity_udf_matches_serial(spark, texts):
    from inspectehr_spark.pipeline.models import perplexity_udf

    df = _batch(spark, texts)
    got = {r["i"]: r["p"] for r in df.select("i", perplexity_udf("text").alias("p")).collect()}
    for i, t in enumerate(texts):
        expect = reference.perplexity_serial(spec.tokenize_py(t))
        assert abs(got[i] - expect) < 1e-9, repr(t)
