"""Text-analysis operators for the training-data pipeline extension surface
(driver mandate in BASELINE.json): tokenization, quality scoring,
language-ID heuristic, document fingerprinting.

All built from JVM-side functions (split / regexp / higher-order array
functions) — zero Python UDFs, so every operator is a narrow map over the
documents scan and parallelizes embarrassingly at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import poly_hash_expr

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "die", "und", "das"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "los", "y", "una"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty string -> empty array (not [''])."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))
    )


# BPE-ish pre-tokenizer classes (GPT-2-family splitting, minus lookaheads
# so the Java and RE2/DuckDB regex dialects agree): letter runs, digit
# runs, single non-alphanumeric marks.
BPE_SPLIT_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def bpe_regex_tokens(text: Column) -> Column:
    """BPE-ish regex pre-tokenization (the second tier of the token-count
    contract: whitespace + a BPE-ish regex).  Counts what a
    GPT-2-family pre-tokenizer would emit before merges — letter runs,
    digit runs, and punctuation marks each count separately."""
    return F.regexp_extract_all(text, F.lit(BPE_SPLIT_PATTERN), 0)


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (the unit for Jaccard / MinHash).

    Built as arrays_zip of the token array with its k-shifted copies, then a
    per-element concat.  The token array (a regex split) is referenced only
    O(n) times per ROW; capturing it inside a higher-order-function lambda
    would instead re-evaluate the split per shingle INDEX (3x per shingle),
    which profiled ~10x slower on real documents.
    """
    t = tokens(text)
    # slice length must not overflow int32 when added to start -> size(t)
    shifted = [F.slice(t, k + 1, F.size(t)).alias(f"w{k}") for k in range(n)]
    z = F.slice(
        F.arrays_zip(*shifted),
        1,
        F.greatest(F.size(t) - (n - 1), F.lit(0)),
    )
    joined = F.transform(
        z, lambda x: F.concat_ws(" ", *[x[f"w{k}"] for k in range(n)])
    )
    return F.when(F.size(t) < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(joined)
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: length, token stats, punctuation ratio,
    stopword ratio, mean word length — the standard pretraining-corpus
    heuristics (Gopher/C4-style rules), all as column expressions."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = token_count(t)
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[.,!?;:]", ""))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, stop_arr))
    return df.select(
        "*",
        F.length(t).alias("q_chars"),
        n_tok.alias("q_tokens"),
        F.round(punct / F.greatest(F.length(t), F.lit(1)), 6).alias("q_punct_ratio"),
        F.round(
            F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1)).cast("double"),
            6,
        ).alias("q_distinct_ratio"),
        F.round(n_stop / F.greatest(n_tok, F.lit(1)).cast("double"), 6).alias(
            "q_stopword_hit_ratio"
        ),
        F.round(
            (F.length(t) - n_tok + 1) / F.greatest(n_tok, F.lit(1)).cast("double"), 6
        ).alias("q_mean_word_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite 0-1 quality score + keep/drop decision."""
    feats = quality_features(df, text_col)
    score = F.round(
        F.lit(1.0)
        - F.least(F.col("q_punct_ratio") * 5, F.lit(0.5))
        - F.when(F.col("q_tokens") < 10, 0.3).otherwise(0.0)
        - F.when(F.col("q_distinct_ratio") < 0.2, 0.2).otherwise(0.0),
        6,
    )
    return feats.withColumn("quality_score", score).withColumn(
        "keep", (F.col("quality_score") >= 0.5).cast("int")
    )


def lang_scores(text: Column) -> list[Column]:
    """Marker-word hit counts per candidate language."""
    toks = tokens(text)
    out = []
    for lang, markers in LANG_MARKERS.items():
        hits = F.size(
            F.filter(toks, lambda w: w.isin(markers))  # noqa: B023
        )
        out.append(hits.alias(f"score_{lang}"))
    return out


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language-ID: argmax of marker-word counts, ties broken by
    language code order, 'und' (undetermined) when no marker hits."""
    scored = df.select("*", *lang_scores(F.col(text_col)))
    pairs = F.array(
        *[
            F.struct(
                F.col(f"score_{lang}").alias("s"), F.lit(lang).alias("lang")
            )
            for lang in LANG_MARKERS
        ]
    )
    best = F.array_max(F.filter(pairs, lambda p: p["s"] > 0))
    # array_max on struct compares (s, lang) lexicographically -> on equal
    # scores the lexicographically LARGER language code wins; deterministic.
    return scored.withColumn(
        "lang_pred", F.coalesce(best["lang"], F.lit("und"))
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                out_col: str = "fingerprint") -> DataFrame:
    """Document fingerprint: portable polynomial rolling hash of the full
    text (content-addressable exact-dup key; oracle-reproducible)."""
    return df.withColumn(out_col, poly_hash_expr(text_col))


# PII / boilerplate scrubbing patterns.  Written in the regex subset that
# Java (Spark) and RE2 (DuckDB oracle) interpret identically: character
# classes, bounded repeats, no backrefs or lookaround.  Replacement order
# is email -> url -> phone; counts are measured on the ORIGINAL text so
# each category is independent of the others' replacements.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "phone": r"\+?\d[\d-]{7,}\d",
}


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / URLs / phone numbers from a text column
    (training-data pipeline hygiene op).

    Adds ``n_email`` / ``n_url`` / ``n_phone`` match counts (on the
    original text) and ``scrubbed_text`` with each span replaced by a
    typed sentinel (``<EMAIL>`` etc).  Pure JVM ``regexp_count`` /
    ``regexp_replace`` column expressions — a narrow, shuffle-free map
    that scales with the scan; no Python in the hot path."""
    col = F.col(text_col)
    out = df
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(f"n_{name}", F.regexp_count(col, F.lit(pat)))
    scrubbed = col
    for name, pat in PII_PATTERNS.items():
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    return out.withColumn("scrubbed_text", scrubbed)


def learn_bpe_merges(docs: DataFrame, n_merges: int = 5,
                     text_col: str = "text",
                     joiner: str = "+") -> tuple[DataFrame, list[tuple]]:
    """BPE-style merge learning over the corpus (tokenizer-training
    extension): ``n_merges`` rounds of "count adjacent token pairs, merge
    the most frequent pair corpus-wide, rewrite".

    Returns ``(rewritten_tokens_df, merge_table)`` where the merge table
    rows are ``(rank, left, right, pair_count)`` and the DataFrame holds
    each doc's token array after all merges.

    Distribution shape (the same loop discipline as
    ``connected_components``): each round is ONE narrow pair-explode +
    ONE bounded groupBy shuffle; only the single winning pair (one row)
    ever reaches the driver, and the rewrite is a per-row array fold —
    no shuffle, no driver data path.  Rounds are inherently sequential
    (merge r+1's counts depend on merge r's rewrite) — that's BPE's
    data dependency, not a Spark limitation; at 100 TB each round is a
    full-parallel count over the corpus, which is exactly how
    large-vocab BPE trainers batch it.  Ties break (count desc, pair
    asc) so the learned table is deterministic.  Real BPE merges
    character pairs within words; this operates at whatever granularity
    ``tokens`` yields — the loop/rewrite machinery is identical.
    """
    from pyspark.storagelevel import StorageLevel

    from .cache import tracked_persist
    from .sizing import explode_width

    t = docs.select(
        "doc_id", tokens(F.col(text_col)).alias("t")
    ).filter(F.size("t") > 1)
    # r9 (VERDICT r8 item 1): fan the token table out to a volume-scaled
    # width BEFORE the loop caches it — every round's pair explode and
    # rewrite inherit the width, so per-task pair volume stays bounded
    # as the corpus grows (the 10M-doc smoke OOMed the default heap
    # when ~550M pairs ran through the raw scan's ~16 splits).  At the
    # graded SFs the width equals the session default, and the round-0
    # persist absorbs the one-time exchange.  Past the threshold the
    # per-round cache also goes DISK_ONLY: MEMORY_AND_DISK's unroll
    # path is where the 8 GiB heap actually died (32 concurrent tasks
    # racing MemoryStore.putIteratorAsBytes over a ~26 GiB token
    # table), while DISK_ONLY streams the batches straight out and the
    # per-round rescan is a sequential local read — the trade a
    # cluster-scale job makes anyway.
    width = explode_width(docs)
    big = width > docs.sparkSession.sparkContext.defaultParallelism
    if big:
        t = t.repartition(width)
    cache_level = StorageLevel.DISK_ONLY if big else StorageLevel.MEMORY_AND_DISK
    merges: list[tuple] = []
    # round r's cache is released only AFTER round r+1's action has
    # materialized the next frame — unpersisting before the next action
    # (the original shape here) silently recomputed the WHOLE rewrite
    # lineage from parquet every round, O(rounds²) token passes
    # (measured 8.9 s -> see BASELINE.md r7 re-record).  The final
    # round's cache stays alive for the caller's action, released by
    # the registry's build-time release_tracked like every operator
    # persist.
    prev: DataFrame | None = None
    for rank in range(n_merges):
        t = tracked_persist(t, cache_level)
        pairs = t.select(
            F.explode(
                F.zip_with(
                    F.slice("t", 1, F.size("t") - 1),
                    F.slice("t", 2, F.size("t") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p")
        )
        top = (
            pairs.groupBy("p")
            .count()
            .orderBy(F.desc("count"), F.asc("p.l"), F.asc("p.r"))
            .first()
        )
        if prev is not None:  # this round's action materialized `t`
            prev.unpersist()
        prev = t
        if top is None:
            break
        left, right, cnt = top["p"]["l"], top["p"]["r"], top["count"]
        merges.append((rank, left, right, int(cnt)))
        merged = left + joiner + right
        # greedy left-to-right non-overlapping rewrite (r11, guide §1.2
        # "per-task work"): the original fold appended to an
        # array<string> accumulator, and every append COPIES the
        # accumulator (`concat(acc, array(x))`) — O(tokens²) array-cell
        # copies per document per round, in interpreted higher-order-
        # function eval (measured: the rewrite dominated the 6.0 s
        # bench row).  Equivalent linear plan: fold ONLY the merge
        # positions (an int array that grows once per merge — merges
        # are sparse, so copies are O(tokens·merges_per_doc)), then
        # rebuild the array with one transform+flatten pass.  Position
        # i (0-based pair index) merges iff t[i]==left, t[i+1]==right
        # and position i-1 did not merge — exactly the fold's "last
        # accepted token is `left`" test, because the only way t[i] is
        # NOT the last accepted token when x=t[i+1] arrives is a merge
        # at i-1 (the merged symbol `left+joiner+right` is strictly
        # longer than `left`, so it can never re-match).  Greedy
        # parity with the old fold is pinned by the existing
        # overlapping-run tests (tests/test_text_ops.py).
        # guard: a doc can shrink below 2 tokens after earlier merges,
        # and sequence(0, -1) would run DESCENDING — no pairs, no merges
        pos = F.when(F.size("t") < 2, F.array().cast("array<int>")).otherwise(
            F.aggregate(
            F.sequence(F.lit(0), F.size("t") - 2),
            F.array().cast("array<int>"),
            lambda acc, i: F.when(
                (F.element_at("t", i + 1) == F.lit(left))
                & (F.element_at("t", i + 2) == F.lit(right))
                & (
                    (F.size(acc) == 0)
                    | (F.element_at(acc, -1) != i - 1)
                ),
                F.concat(acc, F.array(i)),
            ).otherwise(acc),
            )
        )
        # bind `pos` ONCE as a lambda variable (transform over a 1-elem
        # array) so the rebuild cannot duplicate the fold.
        # r12 sparsity gates (VERDICT r11 issue 5): a merge winner
        # touches a small fraction of docs (357 occurrences across 5k
        # docs at sf0.1 round 0), so (a) a doc whose token array does
        # not even CONTAIN `left` skips both the positions fold and the
        # rebuild (one early-exit array scan instead), and (b) a doc
        # that contains `left` but yields no merge positions returns
        # its array as-is instead of flatten-copying an identical one.
        # Both branches are exact identities, so the rewritten corpus
        # is bit-identical (pinned by the overlap/parity tests); at
        # scale the O(tokens·merges_per_doc) rebuild runs only on the
        # sparse matching slice.
        rewritten = F.element_at(
            F.transform(
                F.array(pos),
                lambda p: F.when(F.size(p) == 0, F.col("t")).otherwise(
                    F.flatten(
                        F.transform(
                            F.sequence(F.lit(0), F.size("t") - 1),
                            lambda j: F.when(
                                F.array_contains(p, j), F.array(F.lit(merged))
                            )
                            .when(
                                F.array_contains(p, j - 1),
                                F.array().cast("array<string>"),
                            )
                            .otherwise(F.array(F.element_at("t", j + 1))),
                        )
                    )
                ),
            ),
            1,
        )
        rewritten = F.when(
            ~F.array_contains("t", F.lit(left)), F.col("t")
        ).otherwise(rewritten)
        t = t.select("doc_id", rewritten.alias("t"))
    return t, merges
