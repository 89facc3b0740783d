"""Data-dictionary (SAS PROC FORMAT) decode queries.

The reference consumes its label dictionary by hand; here the
dictionary is parsed by ``sources.sas_labels`` and applied as a
broadcast decode. The embedded sample below exercises the real file's
shape — numeric block, $-prefixed char block, char-keys-without-$
block (the i94addrl quirk), comments, tabs, padded labels — and the
query proves the end-to-end decode (parse → lookup DF → broadcast
left join → default for unmatched codes) against the oracle."""

from __future__ import annotations

from ..sources.sas_labels import (
    decode_with_labels,
    labels_df,
    parse_sas_formats,
)
from .registry import query

# Sample in the exact shape of I94_SAS_Labels_Descriptions.SAS
# (numeric value block :8, $-char block :302, no-$ char block :981).
# Codes 0-19 cover 20 of the 25 testdata nation keys, so the
# default-label path is exercised by real rows.
SAMPLE_LABELS = """
/* NATKEY - nation code to reporting label */
  value natkeyl
   0 =  'ALGERIA REGION '
   1 =  'ARGENTINA REGION'
   2 =  'BRAZIL REGION'
   3 =  'CANADA REGION'
   4 =  'EGYPT REGION '
   5 =  'ETHIOPIA REGION'
   6 =  'FRANCE REGION'
   7 =  'GERMANY REGION'
   8 =  'INDIA REGION'
   9 =  'INDONESIA REGION'
   10	=	'IRAN REGION'
   11	=	'IRAQ REGION'
   12 =  'JAPAN REGION'
   13 =  'JORDAN REGION'
   14 =  'KENYA REGION'
   15 =  'MOROCCO REGION'
   16 =  'MOZAMBIQUE REGION'
   17 =  'PERU REGION'
   18 =  'CHINA REGION'
   19 =  'ROMANIA REGION' ;

/* STATUS - order status flag (char keys without $, like i94addrl) */
value statusl
	'O'='OPEN'
	'F'='FULFILLED'
	'P'='PENDING' ;
"""

FORMATS = parse_sas_formats(SAMPLE_LABELS)


def _values_sql(fmt_name: str) -> str:
    fmt = FORMATS[fmt_name]
    if fmt.is_char:
        return ", ".join(f"('{c}', '{l}')" for c, l in fmt.entries)
    return ", ".join(f"({int(float(c))}, '{l}')" for c, l in fmt.entries)


@query(
    "sas_labels_decode",
    f"""
    SELECT n_nationkey, n_name,
           coalesce(l.label, 'OTHER') AS nation_label
    FROM nation
    LEFT JOIN (VALUES {_values_sql('natkeyl')}) AS l(code, label)
      ON n_nationkey = l.code
    """,
)
def _sas_labels_decode(spark, t):
    # dictionary decode: parse the PROC FORMAT text → broadcast lookup
    # → left join with the reference's everything-else-is-other rule
    lk = labels_df(spark, FORMATS["natkeyl"])
    return decode_with_labels(
        t["nation"].select("n_nationkey", "n_name"),
        "n_nationkey",
        lk,
        out="nation_label",
        default="OTHER",
    )
