"""Portable text-analysis expression builders.

Every function here emits the SAME deterministic computation in two SQL
dialects — ``spark`` (runs JVM-side inside whole-stage codegen; no Python
UDFs) and ``duckdb`` (the correctness oracle). Hash functions are built on
``md5`` (identical hex output in both engines) so MinHash/SimHash/fingerprint
results are bit-for-bit comparable across engines.

Scale notes: all expressions are per-row scalar/array ops — they pushdown,
vectorize, and shard embarrassingly. The only shuffle any consumer needs is
its own groupBy/join.
"""

from __future__ import annotations

#: modulus for the universal hash family; (P-1)^2 < 2^63 so a*h+b never
#: overflows int64 in either engine.
HASH_P = 1_000_000_007


def _lcg_stream(seed: int = 0x5DEECE66D):
    x = seed
    while True:
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        yield x


def hash_coefficients(k: int) -> list[tuple[int, int]]:
    """k fixed (a, b) pairs for h_i(x) = (a*x + b) mod P — generated from a
    constant seed so Spark exprs and oracle SQL embed identical literals."""
    gen = _lcg_stream()
    return [(next(gen) % (HASH_P - 1) + 1, next(gen) % HASH_P) for _ in range(k)]


_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def tokens(col: str, dialect: str) -> str:
    """Non-empty lowercase alphanumeric tokens of a text column.

    Lowercasing is ASCII-only via ``translate`` — engine-independent by
    construction. ``lower()`` is NOT: Java applies Unicode FULL case
    mapping (lower('İ') = 'i' + combining dot U+0307, which then splits
    the token) while DuckDB applies simple folding (lower('İ') = 'i'),
    so a corpus containing U+0130 would hash-diverge every tokenizing
    entry between the Spark plan and its oracle. With the ASCII
    translate, non-ASCII letters are separators in BOTH engines and
    token bytes are engine-independent for ALL inputs, not just the
    ASCII fixtures. (translate is codegen in Spark — no per-token
    lambda added.)
    """
    lowered = ascii_lower(col)
    if dialect == "spark":
        return f"filter(split({lowered}, '[^a-z0-9]+'), x -> x != '')"
    return f"list_filter(regexp_split_to_array({lowered}, '[^a-z0-9]+'), x -> x != '')"


def ascii_lower(col: str) -> str:
    """ASCII-only lowercase, identical SQL in both dialects (see tokens()
    for why engine lower() cannot be used where hashes must agree)."""
    return f"translate({col}, '{_ASCII_UPPER}', '{_ASCII_LOWER}')"


def distinct_tokens(col: str, dialect: str) -> str:
    fn = "array_distinct" if dialect == "spark" else "list_distinct"
    return f"{fn}({tokens(col, dialect)})"


def sorted_distinct_tokens(col: str, dialect: str) -> str:
    fn = "array_sort" if dialect == "spark" else "list_sort"
    return f"{fn}({distinct_tokens(col, dialect)})"


def array_size(expr: str, dialect: str) -> str:
    return f"size({expr})" if dialect == "spark" else f"len({expr})"


def array_join(expr: str, sep: str, dialect: str) -> str:
    if dialect == "spark":
        return f"array_join({expr}, '{sep}')"
    return f"array_to_string({expr}, '{sep}')"


def md5_int32(col: str, dialect: str) -> str:
    """First 32 bits of md5 as a non-negative int64 — the portable base hash."""
    if dialect == "spark":
        return f"cast(conv(substring(md5({col}),1,8),16,10) as bigint)"
    return f"('0x'||substr(md5({col}),1,8))::BIGINT"


def universal_hash(i: int, hash_col: str, coeffs: list[tuple[int, int]]) -> str:
    """h_i over a precomputed base-hash column; dialect-neutral arithmetic."""
    a, b = coeffs[i]
    return f"(({a} * ({hash_col} % {HASH_P}) + {b}) % {HASH_P})"


def count_matching(tokens_expr: str, words: list[str], dialect: str) -> str:
    """Number of tokens (with multiplicity) that are in ``words``."""
    in_list = ", ".join(f"'{w}'" for w in words)
    fn = "filter" if dialect == "spark" else "list_filter"
    inner = f"{fn}({tokens_expr}, x -> x in ({in_list}))"
    return array_size(inner, dialect)


def word_bigrams(tokens_expr: str, dialect: str) -> str:
    """Adjacent-token bigrams as 'w1 w2' strings (n-gram shingles, n=2)."""
    if dialect == "spark":
        # zip tokens with tokens[1:]; the final (last, null) pair concats to
        # null and is filtered out
        return (
            f"filter(zip_with({tokens_expr}, "
            f"slice({tokens_expr}, 2, greatest(size({tokens_expr})-1, 0)), "
            f"(x, y) -> concat(x, ' ', y)), p -> p is not null)"
        )
    return (
        f"list_filter(list_transform(list_zip({tokens_expr}, ({tokens_expr})[2:]), "
        f"p -> p[1] || ' ' || p[2]), x -> x is not null)"
    )


def word_ngrams(tokens_expr: str, n: int, dialect: str) -> str:
    """Consecutive n-token shingles as 'w1 .. wn' strings (generalizes
    word_bigrams); a doc with fewer than n tokens yields no shingles."""
    if dialect == "spark":
        win = f"array_join(slice({tokens_expr}, i, {n}), ' ')"
        # guard short docs explicitly: sequence(1, 0) in Spark counts DOWN
        # ([1, 0]), it does not produce an empty array
        return (
            f"case when size({tokens_expr}) < {n} "
            f"then cast(array() as array<string>) "
            f"else transform(sequence(1, size({tokens_expr}) - {n} + 1), "
            f"i -> {win}) end"
        )
    # element access, NOT a [i:i+n-1] slice: DuckDB list slicing inside a
    # lambda is O(list length) per invocation, which turns the transform
    # quadratic — a single 300k-token document stalled the oracle for
    # minutes (round-9 huge-doc probe), while n indexed accesses are O(1)
    # each. range() caps i at len-n+1, so every access is in bounds.
    win = " || ' ' || ".join(f"({tokens_expr})[i+{j}]" for j in range(n))
    # duckdb range(a, b) is end-exclusive: b <= a yields [] as wanted
    return (
        f"list_transform(range(1, greatest(len({tokens_expr}) - {n} + 1, 0) + 1), "
        f"i -> {win})"
    )


def lines(col: str, dialect: str) -> str:
    """Non-empty trimmed lines of a text column (newline-delimited).

    The DuckDB side must trim an EXPLICIT ``' '`` set: bare ``trim()``
    strips Unicode whitespace there (U+00A0 NBSP included) while Spark's
    ``trim()`` strips only ASCII space — a round-9 cross-engine fuzz of
    this module caught an NBSP-leading line diverging between the
    repetition_signals plan and its oracle (tests/test_text_fuzz.py).
    """
    if dialect == "spark":
        return (
            f"filter(transform(split({col}, chr(10)), x -> trim(x)), "
            f"x -> x != '')"
        )
    return (
        f"list_filter(list_transform(string_split({col}, chr(10)), "
        f"x -> trim(x, ' ')), x -> x != '')"
    )


def window_hashes(
    col: str, w: int, dialect: str, toks_col: str | None = None
) -> str:
    """Rolling w-token window fingerprints: md5-int32 of each consecutive
    w-token window of the document (Rabin-Karp/winnowing-style chunk
    hashes; Schleimer et al., SIGMOD'03). Shorter docs yield one hash of
    all their tokens.

    Pass ``toks_col`` (a BOUND token-array column) on the hot path: the
    window slice lives inside a transform lambda, and an inlined
    tokenizer there re-evaluates per window position — quadratic in
    document length (interpreted higher-order functions don't cache
    inlined argument expressions)."""
    toks = toks_col or tokens(col, dialect)
    if dialect == "spark":
        win = f"array_join(slice({toks}, i, {w}), ' ')"
        return (
            f"transform(sequence(1, greatest(size({toks}) - {w} + 1, 1)), "
            f"i -> {md5_int32(win, 'spark')})"
        )
    # element access instead of a lambda-inner slice (O(len) per window in
    # DuckDB -> quadratic; see word_ngrams). In-bounds only when
    # len >= w, so the short-doc "one hash of everything" case is split
    # out explicitly. coalesce: DuckDB array_to_string([]) is NULL where
    # Spark array_join([]) is '' — without it a ZERO-token document
    # hashes to [md5('')] in Spark but [NULL] here, and the NULL gram
    # silently drops the doc from the rolling-window candidate join
    # while Spark buckets all empty docs together (round-9 text fuzz).
    win = " || ' ' || ".join(f"({toks})[i+{j}]" for j in range(w))
    short = md5_int32(f"coalesce(array_to_string({toks}, ' '), '')", "duckdb")
    return (
        f"CASE WHEN len({toks}) < {w} THEN [{short}] "
        f"ELSE list_transform(range(1, len({toks}) - {w} + 1 + 1), "
        f"i -> {md5_int32(win, 'duckdb')}) END"
    )


#: marker words per language for the n-gram language-ID heuristic.  The
#: heuristic is deterministic scoring over token frequencies; on real text
#: these separate languages well — on the synthetic fixture the value tested
#: is cross-engine equivalence of the scoring pipeline.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
}

#: small stopword list for quality scoring
STOPWORDS = ["the", "a", "of", "and", "is", "in", "to", "for"]
