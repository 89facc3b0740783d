"""SAS PROC FORMAT label-dictionary parsing.

The reference's code→label semantics (country, port, mode, state,
visa) live in a SAS ``proc format`` text file
(reference I94_SAS_Labels_Descriptions.SAS:8-299 numeric country
codes, :302-963 quoted port codes, :972-975 mode, :981- state) and are
consumed by hand there. This module turns any file of that shape into
broadcast-ready lookup DataFrames, making the dictionary a first-class
source.

Shape handled (with the reference file's real-world quirks):

    value <name>          -- numeric codes:   582 = 'MEXICO ...'
    value $<name>         -- string codes:    'ALC' = 'ALCAN, AK   '
    value <name>          -- string codes WITHOUT the $ (i94addrl does
                             this): 'AL' = 'ALABAMA'
    /* comments */, tabs/spaces around '=', label padding, ';' block
    terminators on or after the last entry.

Scale: a format dictionary is KBs — it parses driver-side and joins as
a broadcast, exactly like the other dimension lookups (SURVEY §7.3:
broadcast join, not pandas closure)."""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BLOCK_RE = re.compile(r"\bvalue\s+(\$?)([A-Za-z_]\w*)", re.IGNORECASE)
_ENTRY_RE = re.compile(
    r"""\s*(?:'([^']*)'|"([^"]*)"|([^\s='"]+))\s*=\s*(?:'([^']*)'|"([^"]*)")""",
)
_COMMENT_RE = re.compile(r"/\*.*?\*/", re.DOTALL)


@dataclass
class SasFormat:
    name: str
    is_char: bool  # True when keys are quoted (or the $ prefix is used)
    entries: list[tuple[str, str]]  # (code, label), label rstripped


def parse_sas_formats(text: str) -> dict[str, SasFormat]:
    """Parse every ``value`` block of a PROC FORMAT file. Keys keep
    their source spelling (quoted keys unquoted, numeric keys as the
    bare token); labels are right-stripped (the reference pads them to
    fixed width)."""
    text = _COMMENT_RE.sub(" ", text)
    out: dict[str, SasFormat] = {}
    for m in _BLOCK_RE.finditer(text):
        dollar, name = m.group(1), m.group(2)
        body = text[m.end() :]
        end = body.find(";")
        body = body if end < 0 else body[:end]
        entries: list[tuple[str, str]] = []
        quoted_key = bool(dollar)
        for em in _ENTRY_RE.finditer(body):
            key = next(g for g in em.group(1, 2, 3) if g is not None)
            label = next(g for g in em.group(4, 5) if g is not None)
            if em.group(1) is not None or em.group(2) is not None:
                quoted_key = True  # i94addrl: quoted keys, no $
            entries.append((key.strip(), label.rstrip()))
        out[name.lower()] = SasFormat(name.lower(), quoted_key, entries)
    return out


def labels_df(
    spark: SparkSession, fmt: SasFormat, code_col: str = "code",
    label_col: str = "label",
) -> DataFrame:
    """One format → a lookup DataFrame. Numeric formats get BIGINT
    codes (SAS numerics are doubles, but format codes are integral in
    practice — non-integral codes raise rather than silently
    truncate); char formats keep string codes."""
    if fmt.is_char:
        rows = [(c, l) for c, l in fmt.entries]
        return spark.createDataFrame(rows, f"{code_col} string, {label_col} string")
    rows = []
    for c, l in fmt.entries:
        f = float(c)
        if f != int(f):
            raise ValueError(f"non-integral numeric code {c!r} in {fmt.name}")
        rows.append((int(f), l))
    return spark.createDataFrame(rows, f"{code_col} bigint, {label_col} string")


def load_sas_labels(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Parse a PROC FORMAT file into one lookup DataFrame per format."""
    with open(path, encoding="latin-1") as f:
        formats = parse_sas_formats(f.read())
    return {name: labels_df(spark, fmt) for name, fmt in formats.items()}


def decode_with_labels(
    df: DataFrame,
    col: str,
    labels: DataFrame,
    out: str = "label",
    default: str | None = None,
) -> DataFrame:
    """Broadcast code→label decode. ``default`` reproduces the
    reference's 'everything else goes into other' convention for
    unmatched codes (I94_SAS_Labels_Descriptions.SAS:979); without it,
    unmatched codes stay null."""
    lk = labels.withColumnRenamed("code", "__code").withColumnRenamed(
        "label", out
    )
    joined = df.join(F.broadcast(lk), df[col] == lk["__code"], "left").drop(
        "__code"
    )
    if default is not None:
        joined = joined.withColumn(out, F.coalesce(F.col(out), F.lit(default)))
    return joined
