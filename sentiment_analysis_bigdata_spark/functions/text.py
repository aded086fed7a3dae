"""Text expression library — all JVM-native Column expressions, zero UDFs.

Reference parity (SURVEY §2.2 F1-F8, §2.6 M1/M2/M5):

- ``clean_text``    — the 7-step tweet-cleaning chain, regexes frozen from
  reference preprocessing.py:100-106.
- ``tokenize``      — ML ``Tokenizer`` semantics (lowercase + split on
  whitespace, reference model_logistic_regression.py:88-91) as a pure
  ``F.split(F.lower(...))`` expression.
- ``remove_stopwords`` — ML ``StopWordsRemover`` semantics with the exact
  default 181-word English list serialized in the reference's persisted
  model metadata (model/logistic_regression/stages/1_StopWordsRemover_*/
  metadata/part-00000-*.txt).
- ``ngrams``        — ML ``NGram`` semantics (space-joined sliding windows,
  reference model_logistic_regression.py:124-129).

LLM-pipeline extensions (north star): token counting, quality scoring,
document fingerprinting, n-gram heuristic language ID. Everything here
compiles into whole-stage-codegen'd Catalyst expressions, so the hot path
stays in the JVM at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The exact default English stopword list the reference's StopWordsRemover
# used, frozen from the serialized stage metadata (reference
# model/logistic_regression/stages/1_StopWordsRemover_ff52d89af368/metadata).
# This is Spark ML's public default english stop-word set.
ENGLISH_STOPWORDS: tuple[str, ...] = (
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "your", "yours", "yourself", "yourselves", "he", "him", "his", "himself",
    "she", "her", "hers", "herself", "it", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom", "this",
    "that", "these", "those", "am", "is", "are", "was", "were", "be", "been",
    "being", "have", "has", "had", "having", "do", "does", "did", "doing",
    "a", "an", "the", "and", "but", "if", "or", "because", "as", "until",
    "while", "of", "at", "by", "for", "with", "about", "against", "between",
    "into", "through", "during", "before", "after", "above", "below", "to",
    "from", "up", "down", "in", "out", "on", "off", "over", "under", "again",
    "further", "then", "once", "here", "there", "when", "where", "why",
    "how", "all", "any", "both", "each", "few", "more", "most", "other",
    "some", "such", "no", "nor", "not", "only", "own", "same", "so", "than",
    "too", "very", "s", "t", "can", "will", "just", "don", "should", "now",
    "i'll", "you'll", "he'll", "she'll", "we'll", "they'll", "i'd", "you'd",
    "he'd", "she'd", "we'd", "they'd", "i'm", "you're", "he's", "she's",
    "it's", "we're", "they're", "i've", "we've", "you've", "they've",
    "isn't", "aren't", "wasn't", "weren't", "haven't", "hasn't", "hadn't",
    "don't", "doesn't", "didn't", "won't", "wouldn't", "shan't", "shouldn't",
    "mustn't", "can't", "couldn't", "cannot", "could", "here's", "how's",
    "let's", "ought", "that's", "there's", "what's", "when's", "where's",
    "who's", "why's", "would",
)

# Cleaning regexes frozen from reference preprocessing.py:101-105.
RE_MENTION = r"@[A-Za-z0-9_]+"
RE_URL = r"https?://\S+"
RE_HASHMARK = r"#"
RE_NON_LETTER = r"[^a-zA-Z\s]"
RE_MULTISPACE = r"\s+"


def clean_text(col: Column | str) -> Column:
    """The reference's 7-step tweet clean chain (F1-F8) as one expression.

    lower → strip @mentions → strip URLs → drop '#' → non-letters to space →
    collapse whitespace → trim  (reference preprocessing.py:100-106).
    Chained ``regexp_replace`` calls fuse into a single codegen stage.
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    c = F.regexp_replace(c, RE_MENTION, "")
    c = F.regexp_replace(c, RE_URL, "")
    c = F.regexp_replace(c, RE_HASHMARK, "")
    c = F.regexp_replace(c, RE_NON_LETTER, " ")
    c = F.regexp_replace(c, RE_MULTISPACE, " ")
    return F.trim(c)


def normalize_label(sentiment: Column | str, positive_value: int = 4) -> Column:
    """Label normalization 0/4 → 0/1 (P5, reference preprocessing.py:93-96)."""
    c = F.col(sentiment) if isinstance(sentiment, str) else sentiment
    return F.when(c == positive_value, F.lit(1)).otherwise(F.lit(0)).cast("int")


def tokenize(col: Column | str) -> Column:
    """Practical tokenizer (M1): lowercase, split on ``\\s+``.

    On the reference's cleaned text (single-spaced, trimmed — invariants of
    the clean chain) this is identical to ML ``Tokenizer``; on raw
    multi-whitespace text it differs (``\\s+`` collapses runs, Java
    ``split("\\s")`` emits interior empty tokens). ``tokenize_ml_exact``
    reproduces the ML stage bit-for-bit when raw-text parity matters.
    Like ML's Tokenizer, an empty string yields ``[""]``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(c), RE_MULTISPACE)


def tokenize_ml_exact(col: Column | str) -> Column:
    """Exact ML ``Tokenizer`` twin (SURVEY §7.6): Java ``split("\\s")``
    semantics — split on SINGLE whitespace (interior empty tokens kept),
    trailing empty tokens dropped, ``"" → [""]``.
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    arr = F.split(c, r"\s", -1)
    nonempty_idx = F.filter(
        F.sequence(F.lit(1), F.size(arr)), lambda i: F.element_at(arr, i) != ""
    )
    k = F.when(F.size(nonempty_idx) > 0, F.array_max(nonempty_idx)).otherwise(F.lit(0))
    trimmed = F.when(k > 0, F.slice(arr, 1, k)).otherwise(F.array().cast("array<string>"))
    return F.when(F.length(c) == 0, F.array(F.lit(""))).otherwise(trimmed)


def tokenize_nonempty(col: Column | str) -> Column:
    """``tokenize`` with empty tokens removed — the oracle-friendly variant."""
    return F.filter(tokenize(col), lambda t: t != F.lit(""))


def remove_stopwords(
    tokens: Column | str, stopwords: tuple[str, ...] = ENGLISH_STOPWORDS
) -> Column:
    """ML ``StopWordsRemover`` semantics (M2): case-insensitive drop, keeps
    duplicates and order (unlike ``array_except``, which dedups — so we use
    the higher-order ``filter``).
    """
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    sw = F.lit(list(stopwords))
    return F.filter(c, lambda t: ~F.array_contains(sw, F.lower(t)))


def ngrams(tokens: Column | str, n: int) -> Column:
    """ML ``NGram`` semantics (M5): space-joined sliding windows of length n.

    Pure expression: for i in 0..len-n, join(tokens[i:i+n], ' ').
    Arrays shorter than n yield an empty array (matches ML NGram).
    """
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    idx = F.sequence(F.lit(1), F.size(c) - F.lit(n - 1))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(c, i, n), " "))
    # sequence(1, k) counts DOWN when k < 1, so guard short arrays explicitly
    return F.when(F.size(c) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


# ---------------------------------------------------------------------------
# LLM-pipeline text analysis (north-star extensions)
# ---------------------------------------------------------------------------


def token_count(col: Column | str) -> Column:
    """Whitespace token count — the cheap length signal for quality filters."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(tokenize_nonempty(c)).cast("bigint")


def word_like_token_count(col: Column | str) -> Column:
    """BPE-ish token estimate: count word pieces and standalone punctuation.

    A deterministic regex approximation of subword tokenizer output volume
    (letters runs, digit runs, single punctuation marks each count once).
    """
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return F.size(pieces).cast("bigint")


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality in [0,1] from length/punct/stopword ratios.

    score = 0.4·len_score + 0.3·alpha_ratio + 0.3·stopword_presence, where
    len_score saturates at 200 chars, alpha_ratio is the share of [a-z ]
    characters, and stopword_presence is the share of tokens that are common
    English stopwords (natural prose has some; keyword spam has none).
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c).cast("double")
    len_score = F.least(n / F.lit(200.0), F.lit(1.0))
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z ]", "")).cast("double")
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))

    # let-binding (see lang_id): tokenize once, share across size + filter
    def sw_part(toks: Column) -> Column:
        n_tok = F.size(toks).cast("double")
        sw = F.lit(list(ENGLISH_STOPWORDS))
        n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("double")
        return F.when(
            n_tok > 0, F.least(n_sw / n_tok * 3.0, F.lit(1.0))
        ).otherwise(F.lit(0.0))

    sw_ratio = F.element_at(F.transform(F.array(tokenize_nonempty(c)), sw_part), 1)
    return F.lit(0.4) * len_score + F.lit(0.3) * alpha_ratio + F.lit(0.3) * sw_ratio


# PII patterns restricted to the regex subset Java (Spark) and RE2 (DuckDB)
# interpret identically: no backrefs, no lookaround.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d{2,4}[-. ]\d{3,4}[-. ]\d{3,4}\b", "<PHONE>"),
)


def redact_pii(col: Column | str) -> Column:
    """Scrub emails / IPv4s / phone-shaped numbers to typed placeholders —
    the standard pre-training hygiene pass. A chain of JVM-side
    ``regexp_replace`` (global replace), so the scrub is a narrow map with
    no Python in the path; the same patterns run verbatim on the oracle.
    """
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def repetition_ratio(col: Column | str, n: int = 3) -> Column:
    """Share of duplicate word n-grams in a document, in [0,1] — the
    Gopher-style repetition signal (boilerplate and looping generations
    score high; natural prose scores near 0). 1 - distinct(ngrams)/ngrams;
    documents with fewer than n tokens score 0.
    """
    toks = tokenize_nonempty(col)
    k = F.size(toks) - (n - 1)
    grams = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    total = F.size(grams).cast("double")
    distinct = F.size(F.array_distinct(grams)).cast("double")
    return F.when(total > 0, F.lit(1.0) - distinct / total).otherwise(F.lit(0.0))


def chunk_starts(col: Column | str, stride: int) -> Column:
    """Array of chunk start offsets (0, stride, 2·stride, …) covering the
    string: ``ceil(len/stride)`` chunks; empty text → empty array."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.ceil(F.length(c).cast("double") / stride).cast("int")
    return F.when(
        F.length(c) > 0, F.sequence(F.lit(0), n - 1)
    ).otherwise(F.array().cast("array<int>"))


def chunk_text(
    df, text_col: str = "text", id_col: str = "doc_id",
    chunk_chars: int = 200, stride: int = 150,
):
    """Split documents into overlapping fixed-size character windows —
    context-window prep for retrieval/training (stride < chunk_chars gives
    chunk_chars - stride characters of overlap). JVM-side sequence/explode/
    substr: the fan-out is planned by Catalyst, no Python, no shuffle.
    Returns (id, chunk_idx, chunk); trailing chunks may be shorter.
    """
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.explode(chunk_starts(c, stride)).alias("chunk_idx"),
        c.alias("__t"),
    ).select(
        id_col,
        "chunk_idx",
        F.col("__t")
        .substr(F.col("chunk_idx") * stride + 1, F.lit(chunk_chars))
        .alias("chunk"),
    )


def rolling_hash(col: Column | str, base: int = 131, mod: int = (1 << 31) - 1) -> Column:
    """Polynomial rolling hash of a string: h = fold(h*B + codepoint) mod M.

    The classic Rabin-Karp document fingerprint — order-sensitive (unlike a
    token-set hash) and incrementally computable. Pure expressions:
    transform chars → codepoints, left-fold with modular multiply. M < 2^31
    keeps every intermediate under 2^63 (h*131 + 1114111 < 2^39).
    """
    c = F.col(col) if isinstance(col, str) else col
    idx = F.sequence(F.lit(1), F.length(c))
    codes = F.transform(idx, lambda i: F.ascii(c.substr(i, F.lit(1))).cast("bigint"))
    folded = F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda h, code: F.pmod(h * F.lit(base) + code, F.lit(mod)),
    )
    return F.when(F.length(c) > 0, folded).otherwise(F.lit(0).cast("bigint"))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    Normalization = lowercase + collapse whitespace + trim, so texts that
    differ only in case/spacing collide (the classic exact-dedup key).
    """
    c = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(F.lower(c), RE_MULTISPACE, " "))
    return F.md5(norm)


# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Deliberately small and deterministic — real deployments swap in
# fastText/CLD3; the operator contract (score-per-language, argmax) is what
# the engine provides.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un", "por", "una"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "den", "von"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"),
    "zh": ("de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "zhe4", "bu4", "ren2"),
}


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    """Count of tokens appearing in a fixed marker list (closure-safe)."""
    lst = F.lit(list(markers))
    return F.size(F.filter(toks, lambda t: F.array_contains(lst, t))).cast("bigint")


def lang_scores(col: Column | str) -> Column:
    """Map of language → marker-token hit count over the document's tokens.
    Tokenization is let-bound (see lang_id) so the 5 marker passes share
    one tokenize evaluation."""
    def build(toks: Column) -> Column:
        pairs = [
            F.struct(
                F.lit(lang).alias("lang"),
                _marker_hits(toks, markers).alias("hits"),
            )
            for lang, markers in _LANG_MARKERS.items()
        ]
        return F.map_from_entries(F.array(*pairs))

    return F.element_at(F.transform(F.array(tokenize_nonempty(col)), build), 1)


def lang_id(col: Column | str) -> Column:
    """Argmax language by marker hits; 'und' when nothing matches.

    Deterministic tie-break: higher hits first, then language code
    ascending (the when-chain below tests languages in ascending order, so
    the first equal-to-max wins).

    Perf shape: there is no common-subexpression elimination across
    higher-order-function lambda bodies, so naively referencing the token
    array from each of the 5 marker passes re-tokenizes the document 5×
    (measured ~0.78 s of lang_id's 0.89 s at sf0.1). The single-element
    ``transform`` below is a let-binding: the tokenization evaluates ONCE
    and the lambda variable is shared by every marker pass. The argmax is
    a flat ``greatest`` + when-chain — no per-row interpreted array_sort
    comparator. Same values, ~3× cheaper.
    """
    langs = sorted(_LANG_MARKERS)

    def pick_from_hits(harr: Column) -> Column:
        # harr is a bound 5-slot hit array: every reference below is a
        # cheap element read, never a marker-pass re-evaluation
        mx = F.array_max(harr)
        chain = None
        for i, lang in enumerate(langs):
            c = harr[i] == mx
            chain = (
                F.when(c, F.lit(lang)) if chain is None else chain.when(c, F.lit(lang))
            )
        return F.when(mx > 0, chain).otherwise(F.lit("und"))

    def pick(toks: Column) -> Column:
        harr = F.array(
            *[_marker_hits(toks, _LANG_MARKERS[lang]) for lang in langs]
        )
        return F.element_at(F.transform(F.array(harr), pick_from_hits), 1)

    return F.element_at(F.transform(F.array(tokenize_nonempty(col)), pick), 1)


# --- HTML / markup stripping (web-corpus curation) -----------------------------

#: (pattern, replacement) chain — RE2 ∩ Java regex subset (no backrefs, no
#: lookaround) so the identical patterns run on the DuckDB oracle.
HTML_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"(?is)<script[^>]*>.*?</script>", " "),   # script blocks incl. body
    (r"(?is)<style[^>]*>.*?</style>", " "),     # style blocks incl. body
    (r"(?is)<!--.*?-->", " "),                  # comments
    (r"(?is)<[a-z!/][^>]*>", " "),              # any remaining tag
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    # &amp; decodes LAST so double-escaped entities ("&amp;lt;") resolve to
    # the literal entity text ("&lt;"), not a spurious "<".
    (r"&amp;", "&"),
    (r"\s+", " "),                              # collapse whitespace
)


def strip_html(col: Column | str) -> Column:
    """Strip HTML/markup to visible text: drop script/style bodies,
    comments, and tags; decode the common entities; collapse whitespace —
    the first pass of any web-crawl curation pipeline. Pure JVM
    ``regexp_replace`` chain (narrow, fuses into the scan); the same
    patterns run verbatim on the oracle."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in HTML_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return F.trim(c)
