"""PROC FORMAT dictionary parser: shape quirks + broadcast decode."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from udacitycapstonedataengineer_spark.sources.sas_labels import (
    decode_with_labels,
    labels_df,
    parse_sas_formats,
)

SAMPLE = """
libname library 'Your file location' ;
proc format library=library ;

/* COUNTRY - numeric codes; the 582 line has a multi-word label */
  value cntyl
   582 =  'MEXICO Air Sea, and Not Reported (I-94, no land arrivals)'
   236 =  'AFGHANISTAN'
   687 =  'ARGENTINA ' ;

/* PORT - $ prefix, tab separators, padded labels */
  value $prtl
   'ALC'\t=\t'ALCAN, AK             '
   '5KE'\t=\t'KETCHIKAN, AK' ;

/* STATE - char keys WITHOUT the $ prefix (i94addrl quirk) */
value addrl
\t'AL'='ALABAMA'
\t'DC'='DIST. OF COLUMBIA' ;

value model
\t1 = 'Air'
\t9 = 'Not reported' ;
run ;
"""


def test_parse_blocks_and_quirks():
    fmts = parse_sas_formats(SAMPLE)
    assert set(fmts) == {"cntyl", "prtl", "addrl", "model"}

    cnty = fmts["cntyl"]
    assert not cnty.is_char
    assert ("582", "MEXICO Air Sea, and Not Reported (I-94, no land arrivals)") in cnty.entries
    assert ("687", "ARGENTINA") in cnty.entries  # label rstripped

    prt = fmts["prtl"]
    assert prt.is_char
    assert ("ALC", "ALCAN, AK") in prt.entries  # padding stripped
    assert ("5KE", "KETCHIKAN, AK") in prt.entries  # digit-leading key

    addr = fmts["addrl"]
    assert addr.is_char  # inferred from quoted keys despite missing $
    assert ("DC", "DIST. OF COLUMBIA") in addr.entries

    assert fmts["model"].entries == [("1", "Air"), ("9", "Not reported")]


def test_labels_df_types_and_decode(spark):
    fmts = parse_sas_formats(SAMPLE)
    num = labels_df(spark, fmts["model"])
    assert dict(num.dtypes) == {"code": "bigint", "label": "string"}
    ch = labels_df(spark, fmts["addrl"])
    assert dict(ch.dtypes) == {"code": "string", "label": "string"}

    df = spark.createDataFrame([(1, 1), (2, 9), (3, 5)], "id long, mode long")
    out = decode_with_labels(df, "mode", num, out="mode_label", default="other")
    got = {r.id: r.mode_label for r in out.collect()}
    assert got == {1: "Air", 2: "Not reported", 3: "other"}
    # broadcast join, not a shuffle
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


REFERENCE_LABELS = "/root/reference/I94_SAS_Labels_Descriptions.SAS"


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_LABELS), reason="reference file not present"
)
def test_parse_reference_file():
    """The real dictionary: 4 expected format blocks with known sizes
    (country :8-299, port :302-963, mode :972, state :981)."""
    with open(REFERENCE_LABELS, encoding="latin-1") as f:
        fmts = parse_sas_formats(f.read())
    assert set(fmts) == {"i94cntyl", "i94prtl", "i94model", "i94addrl"}
    assert not fmts["i94cntyl"].is_char
    assert fmts["i94prtl"].is_char
    assert fmts["i94addrl"].is_char  # no $ in source, quoted keys
    assert len(fmts["i94cntyl"].entries) > 200
    assert len(fmts["i94prtl"].entries) > 500
    assert fmts["i94model"].entries == [
        ("1", "Air"), ("2", "Sea"), ("3", "Land"), ("9", "Not reported"),
    ]
    assert dict(fmts["i94addrl"].entries)["DC"] == "DIST. OF COLUMBIA"
