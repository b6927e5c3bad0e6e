"""Text analysis building blocks: tokenize, shingle, minhash, simhash.

Engine-neutral hashing: every hash that must agree with the DuckDB
oracle is MD5-based (both engines produce identical lowercase hex).
MinHash uses the *lexicographic minimum of seeded MD5s* — an order
statistic over a uniform hash domain, so the standard MinHash Jaccard
estimate holds; strings compare identically everywhere.  xxhash64
would be faster Spark-side but has no DuckDB twin; swap
``seeded_hash`` for production use.

Scale notes: tokenize/shingle are narrow per-row ops (no shuffle);
minhash signatures are one groupBy per document over exploded
shingles with map-side partial MIN aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- tokenization -----------------------------------------------------------


def tokens(col: Column) -> Column:
    """Single-space tokenization, lowercased (the fixture texts are
    single-space joined; literal-space split matches DuckDB's
    string_split exactly)."""
    return F.split(F.lower(col), " ")


TOKENS_SQL = "string_split(lower({col}), ' ')"

# A BPE-ish word/punctuation regex (public GPT-2-style pattern, simplified
# to the character classes both regex engines treat identically).
BPE_ISH_REGEX = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def shingles(col: Column, k: int = 3) -> Column:
    """k-token shingles joined by spaces; < k tokens -> empty array.

    Implemented as a zip of k shifted slices rather than
    transform+element_at: a lambda that indexes the token array would
    have the tokenization inlined into every element access by
    CollapseProject (measured ~15x slower); slicing references the
    array k times per ROW, not per element.
    """
    t = tokens(col)
    win = F.greatest(F.size(t) - (k - 1), F.lit(0))
    acc = F.slice(t, k, win)
    for j in range(k - 2, -1, -1):
        acc = F.zip_with(F.slice(t, j + 1, win), acc, lambda a, b: F.concat_ws(" ", a, b))
    return acc


def shingle_digests(col: Column, k: int = 8) -> Column:
    """xxhash64 digest per k-token window, WITHOUT materializing the
    window strings: hash each token once, then combine the k shifted
    token-hash slices with one xxhash64(k longs) per window.  Position
    j of the result digests tokens [j, j+k) — identical alignment to
    ``shingles()``.

    For digest-only consumers (equality joins/grouping: the exact-
    substring window index, the cross-source gram-leak audit) this is
    ~1.5x cheaper than building the k-token strings and hashing them,
    because the k-1 chained concat allocations disappear.  NOT a
    drop-in for consumers that need the shingle text (MinHash's md5
    order statistic, the Jaccard postings)."""
    t = tokens(col)
    th = F.transform(t, lambda x: F.xxhash64(x))
    win = F.greatest(F.size(t) - (k - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(th, j + 1, win).alias(f"c{j}") for j in range(k)])
    return F.transform(z, lambda s: F.xxhash64(*[s[f"c{j}"] for j in range(k)]))


def shingle_digest_pairs(col: Column, k: int = 8) -> Column:
    """(h, h2) 128-bit digest pair per k-token window — the
    collision-hardened variant of ``shingle_digests``: h chains the
    unsalted per-token xxhash64s, h2 chains per-token hashes salted
    with an independent seed column, so two windows collide only if
    BOTH 64-bit digests collide (~2^-128 for distinct token
    sequences; a single-token xxhash64 collision cannot alias the
    pair because the salted token hashes differ).  Returns an array
    of structs {h: long, h2: long}, position-aligned with
    ``shingles()``.

    Used by the exact-substring window index and the cross-source
    gram-leak audit, whose DuckDB oracles digest the literal window
    STRINGS — a Spark-side collision would silently diverge from the
    oracle, so the exactness contract needs the 128-bit key (the
    64-bit variant documented this as its residual risk).

    Formulation note (measured at sf0.1, warm): BOTH per-token hashes
    are computed in ONE transform pass emitting a 2-long struct —
    a second ``transform(t, ...)`` pass re-inlines the tokenization
    per element (the CollapseProject trap documented on shingles())
    and costs ~2x; zipping 16 separate long-slices instead of 8
    struct-slices costs ~1.3x.  The fully-independent pair is ~1.4x
    the single-lane digest — the price of the 2^-128 bound (deriving
    lane 2 from lane 1's LONGS would be ~1.07x but lets a single
    token-level xxhash64 collision alias both lanes, and at 1e9+
    distinct tokens that birthday is no longer negligible)."""
    t = tokens(col)
    pairs = F.transform(
        t,
        lambda x: F.struct(
            F.xxhash64(x).alias("a"),
            F.xxhash64(x, F.lit("kcptc-g2")).alias("b"),
        ),
    )
    win = F.greatest(F.size(t) - (k - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(pairs, j + 1, win).alias(f"c{j}") for j in range(k)])
    return F.transform(
        z,
        lambda s: F.struct(
            F.xxhash64(*[s[f"c{j}"]["a"] for j in range(k)]).alias("h"),
            F.xxhash64(*[s[f"c{j}"]["b"] for j in range(k)]).alias("h2"),
        ),
    )


def shingles_sql(col: str, k: int = 3) -> str:
    """DuckDB rendering of shingles() (1-based list indexing)."""
    t = f"string_split(lower({col}), ' ')"
    parts = " || ' ' || ".join(f"t[i + {j}]" for j in range(k))
    return (
        f"(SELECT coalesce(list_transform(generate_series(1, len(t) - {k - 1}), i -> {parts}), []) "
        f"FROM (SELECT {t} AS t))"
    )


# --- hashing ----------------------------------------------------------------


def seeded_hash(seed: int, col: Column) -> Column:
    """Engine-neutral seeded hash: md5(seed || '|' || value) hex string."""
    return F.md5(F.concat(F.lit(f"{seed}|"), col))


def seeded_hash_sql(seed: int, expr: str) -> str:
    return f"md5('{seed}|' || {expr})"


_ODD_HEX = ("1", "3", "5", "7", "9", "b", "d", "f")


def hex_bit(hash_col: Column, bit: int) -> Column:
    """One pseudo-random bit per hex position: the parity of the
    (bit+1)-th hex char of an md5 string.  Portable across engines —
    no hex-to-int parsing needed."""
    return (
        F.when(F.substring(hash_col, bit + 1, 1).isin(*_ODD_HEX), F.lit(1))
        .otherwise(F.lit(0))
    )


def hex_bit_sql(hash_expr: str, bit: int) -> str:
    odd = ", ".join(f"'{c}'" for c in _ODD_HEX)
    return f"(CASE WHEN substring({hash_expr}, {bit + 1}, 1) IN ({odd}) THEN 1 ELSE 0 END)"
