"""Text-analysis operators for training-data pipelines (beyond-reference,
BASELINE.json north star): tokenization, quality scoring, language ID,
fingerprinting.

All expressions are engine-portable by construction: integer counts and
left-associative folds only, so the DuckDB oracle computes bit-identical
values. The one cross-engine hash primitive is a 31-base rolling hash over
character codes mod 2^31-1 (``char_hash``) — at production scale you swap it
for ``xxhash64`` (see dedup.py's scale-path variants); the *pipeline shape*
is identical.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_MOD = 2_147_483_647  # 2^31 - 1

#: BPE-ish token pattern: letter runs, digit runs, single punctuation
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "es", "por"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "im", "ein"],
    "fr": ["le", "les", "des", "et", "est", "une", "dans", "que", "pour", "sur"],
    "zh": ["de", "shi", "zai", "le", "he", "you", "wo", "ta", "men", "zhe"],
}


def char_hash(col: Column) -> Column:
    """Portable rolling hash: left fold of ``acc*31 + ascii(char) mod 2^31-1``.

    Deterministic and identical to DuckDB's
    ``list_reduce(list_transform(string_split(s,''), c -> ascii(c)), ...)``
    because a left fold from 0 equals a reduce seeded with the first element.
    """
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % HASH_MOD,
    )


def words(col: Column) -> Column:
    return F.split(col, " ")


def n_words(col: Column) -> Column:
    return F.size(words(col))


def stopword_count(col: Column, lang: str) -> Column:
    wl = STOPWORDS[lang]
    return F.size(F.filter(words(col), lambda w: w.isin(*wl)))


def token_stats(documents: DataFrame) -> DataFrame:
    """Whitespace + BPE-ish token counts per document (all JVM-side).

    regexp_count counts matches without materializing the match array —
    on long documents that halves the per-row allocation vs
    size(regexp_extract_all(...)) while returning the same value.
    """
    return documents.select(
        "doc_id",
        F.length("text").alias("n_chars_m"),
        n_words(F.col("text")).alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(TOKEN_REGEX)).alias("bpe_tokens"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Heuristic quality scoring: length/stopword/punct signals → [0,1] score.

    All ratios are exact-int divisions; the final affine combination is the
    same expression tree in both engines → bit-identical doubles.
    """
    nw = n_words(F.col("text"))
    length = F.length("text")
    stop_en = stopword_count(F.col("text"), "en")
    punct = length - F.length(F.regexp_replace("text", r"[^A-Za-z0-9 ]", ""))
    base = documents.select(
        "doc_id", "lang",
        length.alias("n_chars_m"),
        nw.alias("nw"),
        # single-space-joined text: total word chars = len - (nw - 1)
        ((length - (nw - 1)).cast("double") / nw.cast("double")).alias("avg_word_len"),
        (stop_en.cast("double") / nw.cast("double")).alias("stopword_ratio"),
        (punct.cast("double") / length.cast("double")).alias("punct_ratio"),
    )
    score = (
        F.least(F.lit(1.0), F.col("nw").cast("double") / 100.0) * 0.5
        + F.col("stopword_ratio") * 0.3
        + (1.0 - F.col("punct_ratio")) * 0.2
    )
    return base.withColumn("quality_score", score).drop("nw")


def gopher_rules(
    documents: DataFrame,
    min_words: int = 10,
    max_words: int = 100_000,
    min_avg_word: float = 3.0,
    max_avg_word: float = 10.0,
    min_alpha_ratio: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher-style document-quality rule gates (Rae et al. 2021, public
    paper §A1.1): per-document boolean flags plus the conjunction `keep`.

    Rules (thresholds parameterized; defaults adapted to the fixture's
    ~20-word docs — production uses the paper's 50/100k):
      word_count      min_words <= n_words <= max_words
      mean_word_len   min_avg_word <= (chars-per-word) <= max_avg_word
      alpha_ratio     >= min_alpha_ratio of words contain a letter
      stopword_gate   >= min_stopwords English stopwords appear

    Unlike ``quality_scores`` (a soft [0,1] score for curriculum /
    weighted sampling) these are the hard gates a filtering stage applies
    first. Everything is a row-local JVM expression — pure map, no
    shuffle, fully pushdown-friendly; the mean-word-length division is
    IEEE-exact so the oracle doubles match bit-for-bit.
    """
    w = words(F.col("text"))
    base = documents.select("doc_id", "lang", w.alias("w"))
    nw = F.size("w")
    # single-space-joined text: total word chars = sum of word lengths
    mean_len = (
        F.aggregate(F.col("w"), F.lit(0), lambda a, x: a + F.length(x))
        .cast("double") / nw.cast("double")
    )
    alpha_ratio = (
        F.size(F.filter(F.col("w"), lambda t: t.rlike("[A-Za-z]")))
        .cast("double") / nw.cast("double")
    )
    n_stop = F.size(F.filter(F.col("w"), lambda t: t.isin(*STOPWORDS["en"])))
    flagged = base.select(
        "doc_id", "lang",
        nw.alias("n_words_g"),
        mean_len.alias("mean_word_len"),
        alpha_ratio.alias("alpha_ratio"),
        n_stop.alias("n_stopwords"),
        ((nw >= min_words) & (nw <= max_words)).alias("pass_word_count"),
        ((mean_len >= min_avg_word) & (mean_len <= max_avg_word))
        .alias("pass_mean_word_len"),
        (alpha_ratio >= min_alpha_ratio).alias("pass_alpha_ratio"),
        (n_stop >= min_stopwords).alias("pass_stopwords"),
    )
    return flagged.withColumn(
        "keep",
        F.col("pass_word_count") & F.col("pass_mean_word_len")
        & F.col("pass_alpha_ratio") & F.col("pass_stopwords"),
    )


def _lang_id_df(documents: DataFrame) -> DataFrame:
    """Stopword-overlap language ID with deterministic argmax.

    Returns per-language scores, the prediction, and correctness vs the
    labeled ``lang``. Tie-break: first language in alphabetical order wins
    (same CASE chain in the oracle).
    """
    # materialize the split ONCE as a physical column (CollapseProject
    # will not inline a non-cheap alias referenced 10×; same pattern as
    # dedup.shingle_sets) — one tokenize pass instead of one per language
    langs = sorted(STOPWORDS)
    nw = F.size("w").cast("double")
    df = documents.select(
        "doc_id", "lang", words(F.col("text")).alias("w")
    ).select(
        "doc_id", "lang",
        *[
            (F.size(F.filter(F.col("w"), lambda t: t.isin(*STOPWORDS[lg])))
             .cast("double") / nw)
            .alias(f"score_{lg}")
            for lg in langs
        ],
    )
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = reduce(
        lambda acc, lg: acc.when(F.col(f"score_{lg}") == best, lg),
        langs[1:],
        F.when(F.col(f"score_{langs[0]}") == best, langs[0]),
    )
    return df.withColumn("predicted", pred).withColumn(
        "correct", (F.col("predicted") == F.col("lang")).cast("int")
    )


def _lang_id_sql() -> str:
    """One-parse SQL text of `_lang_id_df` (r14, guide §1.1/§7.3): the
    chained build re-analyzed the 5-language score tree at every call
    (~0.14 s/invocation of pure driver-side analysis). Rendered from
    the SAME STOPWORDS table; pinned plan-identical by tests/
    test_plans.py::test_lang_id_sql_text_plan_equality."""
    langs = sorted(STOPWORDS)
    score = ", ".join(
        "CAST(size(filter(w, t -> t IN ({wl}))) AS DOUBLE)"
        " / CAST(size(w) AS DOUBLE) AS score_{lg}".format(
            wl=", ".join("'" + t + "'" for t in STOPWORDS[lg]), lg=lg)
        for lg in langs)
    best = "greatest({})".format(
        ", ".join("score_" + lg for lg in langs))
    pred = "CASE {} END".format(" ".join(
        "WHEN score_{lg} = {best} THEN '{lg}'".format(lg=lg, best=best)
        for lg in langs))
    cols = ", ".join("score_" + lg for lg in langs)
    return f"""
SELECT doc_id, lang, {cols}, predicted,
       CAST((predicted = lang) AS INT) AS correct
FROM (
  SELECT doc_id, lang, {cols}, {pred} AS predicted
  FROM (
    SELECT doc_id, lang, {score}
    FROM (SELECT doc_id, lang, split(text, ' ') AS w FROM {{docs}})
  )
)
"""


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-overlap language ID as ONE SQL parse — plan-identical
    to `_lang_id_df` (sameResult-pinned); see _lang_id_sql."""
    from ..functions.sqlsplice import sql_with_plans

    return sql_with_plans(documents.sparkSession, _lang_id_sql(),
                          docs=documents)


def lm_rare_bigrams(documents: DataFrame, rare_den: int = 40) -> DataFrame:
    """CCNet-style language-model quality signal, integer-exact: train a
    bigram LM on the corpus itself, then score each document by the rate
    of low-probability bigrams. High rare-rate marks out-of-domain /
    garbled text the way CCNet's KenLM-perplexity buckets do — but with
    no ``ln`` anywhere, the flag is pure integer arithmetic
    (P(b|a) < 1/rare_den  ⇔  rare_den * c_ab < c_a) so the oracle
    reproduces every value bit-exactly; the only double is the final
    exact IEEE division.

    Scale shape (100 TB): bigram extraction is the same single codegen'd
    regex pass as the dedup shinglers (HOFs are interpreted — see
    dedup.word_shingles); the LM table aggregates on the bigram string
    (one corpus shuffle, map-side combine); history counts derive from
    the LM table itself (vocab-scale, no second corpus pass); the
    score join is bigram-keyed — the LM side is bounded by the observed
    bigram vocabulary, so AQE broadcasts it when it fits and the corpus
    side never shuffles; finally one doc_id groupBy. Integer sums
    everywhere → partial-agg order cannot flip bits.
    """
    w = F.split(F.col("text"), " ")
    pat = "(?:^| )(?=([^ ]* [^ ]*))"
    bigrams = F.when(
        F.size(w) >= 2,
        F.regexp_extract_all(F.col("text"), F.lit(pat), 1),
    ).otherwise(F.array().cast("array<string>"))
    bg = documents.select("doc_id", F.explode(bigrams).alias("bg"))
    lm = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c_ab")).withColumn(
        "w1", F.substring_index("bg", " ", 1)
    )
    hist = lm.groupBy("w1").agg(F.sum("c_ab").alias("c_a"))
    lmh = lm.join(hist, "w1").select("bg", "c_ab", "c_a")
    rare = F.when(
        F.lit(rare_den) * F.col("c_ab") < F.col("c_a"), 1
    ).otherwise(0)
    return (
        bg.join(lmh, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(rare).alias("n_rare"),
        )
        .withColumn(
            "rare_rate",
            F.col("n_rare").cast("double") / F.col("n_bigrams").cast("double"),
        )
    )


def lm_surprise_scores(documents: DataFrame,
                       scale: int = 1_000_000) -> DataFrame:
    """Graded LM quality score without transcendentals (r7): per-doc
    MEAN INVERSE bigram probability under an add-one-smoothed corpus
    bigram LM — the perplexity-adjacent signal `lm_rare_bigrams`'s
    binary flag can't grade by. 1/P(b|a) = (c_a + V) / (c_ab + 1) is a
    ratio of exact integers (V = successor vocabulary size), so each
    term is ONE IEEE division + round to micro units, integer-summed —
    the established cross-engine-exact accumulation (no ``ln``, whose
    last-ulp differences between libm implementations would break the
    value hash; the arithmetic mean of 1/P ranks documents the same
    way the geometric mean underlying perplexity does for a filter
    threshold).

    Scale shape: identical to `lm_rare_bigrams` — one codegen'd regex
    bigram pass, vocab-bounded LM relation joined bigram-keyed (AQE
    broadcasts it when it fits), V as a 1-row broadcast, one doc_id
    groupBy. Integer sums ⇒ partition-order-independent.
    """
    w = F.split(F.col("text"), " ")
    pat = "(?:^| )(?=([^ ]* [^ ]*))"
    bigrams = F.when(
        F.size(w) >= 2,
        F.regexp_extract_all(F.col("text"), F.lit(pat), 1),
    ).otherwise(F.array().cast("array<string>"))
    bg = documents.select("doc_id", F.explode(bigrams).alias("bg"))
    lm = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c_ab")).withColumn(
        "w1", F.substring_index("bg", " ", 1)
    )
    hist = lm.groupBy("w1").agg(F.sum("c_ab").alias("c_a"))
    vocab = lm.select(
        F.countDistinct(F.substring_index("bg", " ", -1)).alias("v")
    )
    lmh = (
        lm.join(hist, "w1")
        .crossJoin(F.broadcast(vocab))          # 1-row scalar
        .select(
            "bg",
            F.round(
                (F.col("c_a") + F.col("v")).cast("double") * scale
                / (F.col("c_ab") + 1).cast("double")
            ).cast("long").alias("inv_p_micro"),
        )
    )
    return (
        bg.join(lmh, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("inv_p_micro").alias("_s"),
        )
        .select(
            "doc_id", "n_bigrams",
            ((F.col("_s") / F.lit(float(scale)))
             / F.col("n_bigrams").cast("double")).alias("mean_inv_prob"),
        )
    )


def clean_text(documents: DataFrame) -> DataFrame:
    """Normalization pass every training corpus gets: lowercase, strip
    non-alphanumerics, collapse whitespace runs, trim. Pure JVM regex —
    one narrow projection, no shuffle; the same three regexes reproduce
    byte-identically in the oracle."""
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +", " ",
        )
    )
    return documents.select(
        "doc_id",
        cleaned.alias("cleaned"),
        F.length(cleaned).alias("n_chars_clean"),
    )


def top_bigrams(documents: DataFrame, k: int = 50) -> DataFrame:
    """Corpus-level bigram frequencies, top-k. The explode is the one
    unavoidable fan-out; the count is a partial-aggregated groupBy on the
    bigram string, then TakeOrderedAndProject — no global sort. At 100 TB
    hot bigrams ('of the') are absorbed by map-side combine."""
    w = F.split(F.col("text"), " ")
    bigrams = F.zip_with(
        F.slice(w, 1, F.size(w) - 1),
        F.slice(w, 2, F.size(w) - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        documents.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(k)
    )


def pmi_bigrams(
    documents: DataFrame, min_count: int = 5, k: int = 50
) -> DataFrame:
    """Collocation mining: top-k word bigrams by a PMI-monotone lift
    ratio — phrases whose words co-occur far above chance ('machine
    learning' vs 'of the'), the standard phrase-detection stage before
    tokenizer training.

    score = (n_xy * B) / (n_x * n_y) where B is the bigram total and
    n_x / n_y are first-/second-position marginals: exactly exp(PMI)
    under the bigram event space, so the ranking equals PMI ranking
    without a cross-engine ``ln`` (see ranking.py on ulp portability);
    the doubles divide identical longs in identical association order
    on both engines.

    Shape (100 TB): ONE corpus-scale shuffle (the bigram groupBy, with
    map-side combine absorbing hot pairs); both marginals and the total
    aggregate the already-counted vocabulary-sized relation and
    broadcast back; top-k is TakeOrderedAndProject with a (w1, w2)
    tiebreak — no global sort, no second corpus pass.
    """
    w = words(F.col("text"))
    bigrams = F.zip_with(
        F.slice(w, 1, F.size(w) - 1),
        F.slice(w, 2, F.size(w) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    c = (
        documents.select(F.explode(bigrams).alias("bg"))
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_xy"))
    )
    left = c.groupBy("w1").agg(F.sum("n_xy").alias("n_x"))
    right = c.groupBy("w2").agg(F.sum("n_xy").alias("n_y"))
    total = c.agg(F.sum("n_xy").alias("bt"))
    return (
        c.filter(F.col("n_xy") >= min_count)
        .join(F.broadcast(left), "w1")
        .join(F.broadcast(right), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1", "w2", "n_xy", "n_x", "n_y",
            ((F.col("n_xy").cast("double") * F.col("bt").cast("double"))
             / (F.col("n_x").cast("double") * F.col("n_y").cast("double"))
             ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """Content fingerprints: md5 (exact dedup key) + rolling hash."""
    return documents.select(
        "doc_id",
        F.md5("text").alias("md5"),
        char_hash(F.col("text")).alias("roll_hash"),
    )


# PII/link scrub patterns — kept to syntax shared by Java regex (Spark)
# and RE2 (DuckDB): character classes, +/{n,} quantifiers, no lookaround
URL_REGEX = r"https?://[^ ]+"
EMAIL_REGEX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def repetition_stats(documents: DataFrame, k: int = 3) -> DataFrame:
    """Within-document repetition quality signals (Gopher/C4-style): the
    fraction of duplicated word k-grams and the share of the single most
    repeated k-gram. High values mark boilerplate / degenerate text that
    a training pipeline filters out.

    All per-row JVM expressions, zero shuffle: the duplicated fraction is
    `array_distinct` over the doc's shingle array; the top-k-gram share
    sorts the array and folds a max-run-length accumulator over it
    (O(k log k) per doc — NOT the O(k²) count-each-element formulation),
    so cost stays linear-ish in document length at 100 TB.
    """
    from .dedup import shingles  # deferred: dedup imports from this module

    w = F.split(F.col("text"), " ")
    sh = shingles(F.col("text"), k=k, words=w)
    srt = F.sort_array(sh)
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        run = (
            F.when((acc["run"] == 0) | (acc["prev"] != x), F.lit(1))
            .otherwise(acc["run"] + 1)
        )
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    max_cnt = F.aggregate(srt, acc0, step, lambda acc: acc["best"])
    n = F.size(sh).cast("long")
    n_dist = F.size(F.array_distinct(sh)).cast("long")
    return documents.select(
        "doc_id",
        n.alias("n_ngrams"),
        n_dist.alias("n_distinct_ngrams"),
        (F.lit(1.0) - n_dist.cast("double") / n.cast("double"))
        .alias("dup_ngram_frac"),
        (max_cnt.cast("double") / n.cast("double")).alias("top_ngram_frac"),
    )


def scrub_text(documents: DataFrame) -> DataFrame:
    """PII/link scrubbing for training corpora: URLs and email addresses
    are replaced with stable placeholder tokens, and per-doc match counts
    are kept for filtering/audit. Single-pass JVM regexps (codegen'd),
    applied emails-then-URLs; counts are computed on the RAW text, so an
    address embedded in a URL increments both counters.
    """
    no_email = F.regexp_replace(F.col("text"), EMAIL_REGEX, "<EMAIL>")
    scrubbed = F.regexp_replace(no_email, URL_REGEX, "<URL>")
    return documents.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(EMAIL_REGEX), F.lit(0)))
        .cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(URL_REGEX), F.lit(0)))
        .cast("long").alias("n_urls"),
    )


def strip_markup(col: Column) -> Column:
    """Web-crawl boilerplate cleaning: drop <script>/<style> blocks
    whole, strip every remaining tag, decode the common HTML entities,
    collapse runs of spaces, trim. Single-pass JVM regexps (codegen'd),
    reproducible in DuckDB's RE2 — the pattern subset here ((?is) flags,
    lazy block match, [^>]+ tags) means the same thing in both engines,
    which is what lets the oracle check the exact cleaned strings.

    ``&amp;`` decodes LAST: decoding it first would turn ``&amp;lt;``
    into ``&lt;`` and then wrongly into ``<`` (the classic double-decode
    bug); with the amp last, ``&amp;lt;`` correctly yields ``&lt;``.
    """
    s = F.regexp_replace(col, r"(?is)<script\b.*?</script>", " ")
    s = F.regexp_replace(s, r"(?is)<style\b.*?</style>", " ")
    s = F.regexp_replace(s, r"<[^>]+>", " ")
    for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, " {2,}", " "))
