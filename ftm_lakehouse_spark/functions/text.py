"""Text-analysis column builders — shared by the operators and the query
inventory. Everything is JVM-side expressions (split/filter/transform/
aggregate higher-order functions); no Python UDFs in any hot path.

Determinism note: tokenization uses explicit ASCII character classes
(not ``\\w``/``\\s`` shorthands) so Spark's Java regex and DuckDB's RE2
agree byte-for-byte in oracle comparisons.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "word_shingles",
    "char_shingles",
    "token_count",
    "fingerprint",
    "minhash_signature",
    "lsh_band_keys",
]

#: default English stopword sample for ratio features
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "that")


def tokens(text: Column, pattern: str = "[^a-z0-9]+") -> Column:
    """Lowercased tokens, empty strings removed."""
    return F.array_remove(F.split(F.lower(text), pattern), "")


def token_count(text: Column) -> Column:
    return F.size(F.array_remove(F.split(text, "\\s+"), "")).cast("long")


def word_shingles(text: Column, n: int = 3) -> Column:
    """n-word shingles (distinct) — the unit set for Jaccard/MinHash.

    The token array is bound as a lambda variable (via a one-element
    ``transform``) so the tokenizer runs ONCE per row — inlining it in
    the per-index lambda would re-split the text per shingle, turning
    the projection O(len²)."""

    def make(toks: Column) -> Column:
        k = F.size(toks) - (n - 1)
        idx = F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0)))
        sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
        return F.when(k > 0, F.array_distinct(sh)).otherwise(
            F.array().cast("array<string>")
        )

    return F.transform(F.array(tokens(text)), make)[0]


def char_shingles(text: Column, n: int = 5) -> Column:
    """Character n-grams of the normalized text (same one-shot binding
    trick as word_shingles)."""

    def make(norm: Column) -> Column:
        k = F.length(norm) - (n - 1)
        idx = F.sequence(F.lit(1), F.greatest(k, F.lit(1)))
        sh = F.transform(idx, lambda i: norm.substr(i, F.lit(n)))
        return F.when(k > 0, F.array_distinct(sh)).otherwise(
            F.array().cast("array<string>")
        )

    return F.transform(
        F.array(F.regexp_replace(F.lower(text), "[^a-z0-9 ]+", " ")), make
    )[0]


def fingerprint(text: Column) -> Column:
    """Order/duplication-invariant document fingerprint: md5 of the
    sorted distinct token set (the blocking key for near-dup passes)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text)))))


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature as an array of ``num_hashes`` hex strings.

    Hash family: ``md5(seed || shingle)`` — md5 hex strings compared
    LEXICOGRAPHICALLY. MinHash only needs a consistent total order per
    hash function, not integers, and md5-as-string is reproducible in
    any engine (the DuckDB oracle computes the identical signature).
    ``array_min`` over a transformed array stays in codegen; the whole
    signature is one projection, no shuffle.
    """
    # Deliberately num_hashes separate exprs in a CreateArray, NOT one
    # transform-over-seeds: lsh_band_keys extracts signature[i] with
    # constant indices, and Catalyst collapses GetArrayItem(CreateArray)
    # to the single needed element — a transform-built array defeats
    # that and re-evaluates ALL hashes per extraction (~2.5x slower
    # end-to-end, measured at sf0.1).
    def hasher(seed: int):
        # NB: the lambda must take exactly ONE arg — a two-arg lambda
        # makes transform() pass the array index, shadowing the seed
        return lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s))

    sigs = [F.array_min(F.transform(shingles, hasher(i))) for i in range(num_hashes)]
    return F.array(*sigs)


def lsh_band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Banded LSH bucket keys: hash each band of the signature; docs
    sharing ANY band key are near-dup candidates. Returns
    ``array<struct<band:int, key:string>>`` ready to ``explode`` into a
    bucket join — the O(n²) pair space collapses to per-bucket pairs."""
    keys = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|", *[signature[b * rows_per_band + r] for r in range(rows_per_band)]
                )
            ).alias("key"),
        )
        for b in range(bands)
    ]
    return F.array(*keys)


def pii_scrub(text: Column) -> Column:
    """Redact common PII spans with typed placeholders: emails →
    ``<EMAIL>``, IPv4 addresses → ``<IP>``, long digit-dense phone-like
    sequences → ``<PHONE>``. Pure regexp_replace chain — JVM-side,
    codegen-friendly, no UDF. Patterns use explicit ASCII classes so
    Java regex and RE2 agree (the portability rule every text op here
    follows). IP before phone so dotted quads aren't half-eaten."""
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ipv4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
    phone = r"\+?[0-9][0-9()\[\]. -]{6,}[0-9]"
    out = F.regexp_replace(text, email, "<EMAIL>")
    out = F.regexp_replace(out, ipv4, "<IP>")
    return F.regexp_replace(out, phone, "<PHONE>")
