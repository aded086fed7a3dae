"""Stable, oracle-reproducible hashing primitives for dedup & sketches.

Spark's built-in ``F.hash`` is Murmur3-x86-32 and ``F.xxhash64`` is
xxHash64 — both fast, but neither matches DuckDB's hash, so results built on
them can't be value-checked by the ANSI-SQL oracle. For the dedup/sketch
operators we instead derive integer hashes from **md5**, which every engine
computes identically: ``md5_hash64(s)`` = first 16 hex chars of md5(s) read
as an unsigned 64-bit int (we keep 63 bits so it fits signed BIGINT in both
Spark and DuckDB).

The equivalent DuckDB expression for the oracle is::

    CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)

(15 hex chars = 60 bits, always positive in a signed 64-bit integer.)

MinHash permutations use the standard universal-hash family
``h_i(x) = (a_i * x + b_i) mod p`` with p = 2^61 - 1 (a Mersenne prime) and
fixed odd constants, so signatures are deterministic and SQL-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 60-bit md5-prefix hash: identical in Spark and DuckDB.
MD5_PREFIX_HEX_CHARS = 15
MERSENNE_P = (1 << 61) - 1

# Fixed (a, b, s) parameters for the MinHash permutation family — generated
# once from the digits of pi/e/sqrt2/sqrt3 (public constants), NOT at
# runtime, so every run and every engine derives identical signatures.
#
# The per-function XOR salt `s` matters: a bare linear map (a·x + b) mod p
# with 31-bit x and 62-bit product wraps the modulus at most once, so it
# PRESERVES the order of two inputs for most (a, b) — agreement events then
# correlate across all hash functions and tiny sets see agree ∈ {0, 1}
# instead of Binomial(n, j). Salting x with a per-function constant before
# the multiply scrambles the order per function while keeping the product
# within 63 bits (and the SQL twin a one-call `xor`).
_MINHASH_PARAMS: tuple[tuple[int, int, int], ...] = tuple(
    (
        (31415926535897932 * (i + 1) + 2718281828459045) % MERSENNE_P | 1,
        (16180339887498948 * (i + 1) + 14142135623730951) % MERSENNE_P,
        (14142135623730951 * (i + 1) + 17320508075688772) % (1 << 31),
    )
    for i in range(64)
)


def md5_hash64(col: Column | str) -> Column:
    """Deterministic 60-bit integer hash of a string via md5 prefix."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, MD5_PREFIX_HEX_CHARS), 16, 10).cast("bigint")


def minhash_params(num_hashes: int) -> tuple[tuple[int, int], ...]:
    if num_hashes > len(_MINHASH_PARAMS):
        raise ValueError(f"at most {len(_MINHASH_PARAMS)} minhash functions supported")
    return _MINHASH_PARAMS[:num_hashes]


def minhash_signature(tokens: Column | str, num_hashes: int = 16) -> Column:
    """MinHash signature (array<bigint>) over a token/shingle array.

    For each permutation i: min over tokens t of (a_i * md5h(t) + b_i) mod p.
    Empty arrays get signature value p (sentinel max) per slot.

    Pure higher-order expressions — the whole signature computes JVM-side.
    The multiply is done in modular halves to avoid 64-bit overflow:
    (a*x) mod p with a,x < 2^61 via split of x into hi/lo 30-bit parts.
    To keep the expression (and its SQL oracle twin) simple we instead
    reduce the token hash mod 2^31 first, so a*x fits in 63 bits exactly.

    NOTE: each permutation is an interpreted HOF pass allocating a
    permuted array copy per row — fine ad hoc, but corpus-scale signature
    jobs should use ``operators.dedup.minhash_signatures`` (JVM md5 +
    one vectorized Arrow hop, identical values).
    """
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    h31 = F.transform(c, lambda t: F.pmod(md5_hash64_expr(t), F.lit(1 << 31)))
    sig = [
        F.when(F.size(c) > 0, F.array_min(_permute(h31, a, b, s)))
        .otherwise(F.lit(MERSENNE_P))
        .cast("bigint")
        for a, b, s in minhash_params(num_hashes)
    ]
    return F.array(*sig)


def _permute(h31: Column, a: int, b: int, s: int) -> Column:
    """(a·(x⊕s) + b) mod p over an array of 31-bit hashes (closure-safe).
    The xor salt de-correlates the order of any two inputs across hash
    functions (see _MINHASH_PARAMS); product stays within 63 bits."""
    a31 = a % (1 << 31)
    return F.transform(
        h31,
        lambda x: F.pmod(
            F.lit(a31) * x.bitwiseXOR(F.lit(s)) + F.lit(b), F.lit(MERSENNE_P)
        ),
    )


def md5_hash64_expr(c: Column) -> Column:
    """Like ``md5_hash64`` but over an expression (for use inside lambdas)."""
    return F.conv(F.substring(F.md5(c), 1, MD5_PREFIX_HEX_CHARS), 16, 10).cast("bigint")


def simhash64(tokens: Column | str) -> Column:
    """64-bit SimHash over a token array (unweighted).

    bit_j(doc) = 1 if sum over tokens of (+1 if bit_j(h(t)) else -1) > 0.
    60 bits (md5 prefix) are used.

    Single-pass formulation: one ``aggregate`` accumulates a 60-slot vote
    array via ``zip_with`` against a literal bit-mask array, then the votes
    fold into the signature. (An earlier per-bit variant built 60 separate
    aggregate expressions — identical output, but a ~10× larger codegen
    unit and correspondingly slow first-run compilation.)

    NOTE: this per-row expression allocates two 60-element arrays per
    token — fine for ad-hoc use, but for corpus-scale signature jobs use
    ``operators.dedup.simhash_signatures`` (Arrow ``mapInPandas`` numpy
    vote kernel over JVM md5 token hashes — identical values, ~3× faster
    than any interpreted-expression formulation).
    """
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    n_bits = MD5_PREFIX_HEX_CHARS * 4  # 60
    masks = F.array(*[F.lit(1 << j).cast("bigint") for j in range(n_bits)])
    hashes = F.transform(c, md5_hash64_expr)

    def bits_of(h: Column) -> Column:
        return F.transform(
            masks, lambda m: F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1))
        )

    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), n_bits),
        lambda acc, h: F.zip_with(acc, bits_of(h), lambda a, b: a + b),
    )
    contrib = F.zip_with(
        votes, masks, lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("bigint"))
    )
    return F.aggregate(contrib, F.lit(0).cast("bigint"), lambda a, b: a + b)


def simhash64_weighted(tokens: Column | str) -> Column:
    """Weighted 64-bit SimHash: each token votes with weight = its character
    length, so long distinctive tokens dominate the signature and boilerplate
    single-char noise barely moves it (the classic Charikar weighting with
    len(t) standing in for tf-idf — any per-token weight expression works,
    but length is engine-portable so the DuckDB oracle can replay it).

    Same single-pass vote-array formulation as :func:`simhash64`.
    """
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    n_bits = MD5_PREFIX_HEX_CHARS * 4  # 60
    masks = F.array(*[F.lit(1 << j).cast("bigint") for j in range(n_bits)])
    # precompute (hash, weight) per token ONCE — referencing md5 inside the
    # per-mask lambda would re-evaluate it 60× per token (no CSE across
    # higher-order-function lambda bodies)
    hw = F.transform(
        c,
        lambda t: F.struct(
            md5_hash64_expr(t).alias("h"), F.length(t).cast("bigint").alias("w")
        ),
    )

    def weighted_bits(x: Column) -> Column:
        return F.transform(
            masks,
            lambda m: F.when(x.getField("h").bitwiseAND(m) != 0, x.getField("w")).otherwise(
                -x.getField("w")
            ),
        )

    votes = F.aggregate(
        hw,
        F.array_repeat(F.lit(0).cast("bigint"), n_bits),
        lambda acc, x: F.zip_with(acc, weighted_bits(x), lambda a, b: a + b),
    )
    contrib = F.zip_with(
        votes, masks, lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("bigint"))
    )
    return F.aggregate(contrib, F.lit(0).cast("bigint"), lambda a, b: a + b)


def hamming64(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two 64-bit ints (bit_count of xor)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.bit_count(ca.bitwiseXOR(cb))


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """Character k-shingles of a string (array of overlapping substrings)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    idx = F.sequence(F.lit(1), n - F.lit(k - 1))
    shingles = F.transform(idx, lambda i: c.substr(i, F.lit(k)))
    # sequence(1, m) counts DOWN when m < 1, so guard short strings
    return F.when(n >= k, shingles).otherwise(F.array().cast("array<string>"))
