"""SURVEY.md §7 step 1: the one real Arrow risk — array<struct> columns
must round-trip through a pandas-based UDF unchanged."""

from __future__ import annotations

import pandas as pd

from datamunging_spark.operators.munge import INPUT_SCHEMA


def test_array_struct_roundtrip(spark):
    rows = [
        ("d1", [{"kind": "page", "text": "a\nb", "media_ref": "", "offset": 0},
                 {"kind": "image", "text": "", "media_ref": "m/1", "offset": 1}]),
        ("d2", [{"kind": "page", "text": "ſame ﬁre", "media_ref": "", "offset": 0}]),
    ]
    df = spark.createDataFrame(rows, schema=INPUT_SCHEMA)

    def ident(batches):
        for pdf in batches:
            assert isinstance(pdf, pd.DataFrame)
            yield pdf

    out = df.mapInPandas(ident, schema=INPUT_SCHEMA).orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == ["d1", "d2"]
    assert out[0].spans[1].media_ref == "m/1"
    assert out[0].spans[0].text == "a\nb"
    assert out[1].spans[0].text == "ſame ﬁre"


def test_session_confs(spark):
    assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
