"""Bit-parity of the one-expression literal builders (functions/literals)
against the per-element ``F.lit`` forms they replaced (round 13): the
SQL-string rendering must produce exactly the same map/array values for
the real ontology dicts and for adversarial strings (quotes,
backslashes, newlines, unicode)."""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ftm_lakehouse_spark.functions.literals import (
    lit_str_array,
    lit_str_array_map,
    lit_str_int_map,
    lit_str_map,
)
from ftm_lakehouse_spark.model.ontology import (
    PROP_TYPES,
    SCHEMA_ANCESTORS,
    SCHEMA_BUCKETS,
    SCHEMA_SPECIFICITY,
)

ADVERSARIAL = {
    "plain": "value",
    "qu'ote": "it's",
    "back\\slash": "a\\b",
    "new\nline": "tab\there",
    "uni·code→": "ß∂ƒ©",
    "empty": "",
    "'lead": "trail'",
    "\\'both\\'": "\\n not a newline",
}


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_str_map_matches_create_map(spark):
    for mapping in (PROP_TYPES, SCHEMA_BUCKETS, ADVERSARIAL):
        old = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
        assert _one(spark, lit_str_map(mapping)) == _one(spark, old)


def test_str_array_map_matches(spark):
    old = F.create_map(
        *[
            x
            for k, v in sorted(SCHEMA_ANCESTORS.items())
            for x in (F.lit(k), F.array(*[F.lit(a) for a in v]))
        ]
    )
    new = lit_str_array_map({k: v for k, v in sorted(SCHEMA_ANCESTORS.items())})
    assert _one(spark, new) == _one(spark, old)
    # empty-array value branch
    assert _one(spark, lit_str_array_map({"k": []})) == {"k": []}


def test_str_int_map_matches(spark):
    old = F.create_map(
        *[F.lit(x) for kv in sorted(SCHEMA_SPECIFICITY.items()) for x in kv]
    )
    new = lit_str_int_map({k: v for k, v in sorted(SCHEMA_SPECIFICITY.items())})
    assert _one(spark, new) == _one(spark, old)


def test_str_array_matches(spark):
    vals = list(ADVERSARIAL) + list(ADVERSARIAL.values())
    assert _one(spark, lit_str_array(vals)) == vals
    assert _one(spark, lit_str_array([])) == []
