"""Training-data curation operators: benchmark decontamination,
repetition signals, PII redaction, and budgeted data selection.

Not present in the reference (its ETL stops at heuristic labeling,
src/ETL/heuristic_label.py); these are the standard LLM-corpus curation
family (GPT-3 appendix C / The Pile / Gopher rules), built Spark-first:

  decontaminate   — n-gram overlap against a benchmark/eval set; the
                    bench side is tiny by construction -> broadcast hash
                    join, the corpus shingle stream never shuffles
  repetition      — Gopher-style duplicate/top n-gram fractions computed
                    PER ROW with higher-order functions: zero exchange
                    (the groupBy(doc, gram) alternative shuffles the
                    entire gram stream — O(corpus tokens) — to compute a
                    per-doc scalar; interpreted-lambda overhead is the
                    right price for removing that exchange at 100 TB)
  pii_redact      — regex counts + redaction as pure column expressions
                    (patterns chosen to parse identically under Java
                    regex and DuckDB's RE2 so the op stays oracle-checkable)
  token_budget    — select the highest-quality docs whose cumulative
                    token count fits a budget: one distributed sort +
                    running sum (Spark's range-partitioned sort — the
                    same shape it uses for any 100 TB ORDER BY)
  shuffle/pack/mix— reproducible training shuffle emitted as shard
                    assignments (per-bucket windows, no global
                    row_number), GPT-style fixed-length sequence packing
                    over per-bucket token streams, and deterministic
                    per-source Bernoulli mixing — the materialization
                    steps between a curated corpus and a training run
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _h64, shingles
from .textops import spread_small_input, token_array



def _stage_parquet(df: DataFrame, checkpoint_dir: str, name: str) -> DataFrame:
    """Durable staging for multi-pass operators: write ``df`` to a
    UNIQUE subpath of ``checkpoint_dir`` and read it back, truncating
    lineage in a way that survives executor loss (unlike
    localCheckpoint's unreplicated blocks).  The uuid suffix keeps two
    calls sharing a checkpoint_dir from aliasing each other's staging —
    the returned frame re-reads its path LAZILY, so a fixed subpath
    would let a second call's overwrite silently corrupt the first
    call's pending result.

    CALLERS OWN CLEANUP of ``checkpoint_dir`` (round-7 ADVICE): because
    the returned frame stays lazily bound to its staged path, the
    operator cannot know when it is safe to delete — repeated calls
    therefore grow the directory until the caller removes it (rmtree the
    whole checkpoint_dir once results are materialized, as the tests
    do via tmp_path).  Unlike connected_components' internal iteration
    (which prunes all but the last staged round itself), these staged
    paths are part of the returned result's lineage."""
    import uuid

    path = f"{checkpoint_dir}/{name}_{uuid.uuid4().hex[:12]}"
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def ngram_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_hit_shingles, n_bench_docs) for every corpus doc sharing
    at least one n-gram shingle with the benchmark set — the GPT-3/Pile
    decontamination rule (they use 13-grams over web text; n is a knob
    because this corpus' docs are ~50 tokens).

    Scale shape: the benchmark side is small by definition (eval sets are
    thousands of docs, the corpus is billions), so its distinct shingles
    are broadcast and the corpus stream is probed map-side — no shuffle
    of corpus shingles ever happens; the only exchange is the per-doc
    count aggregation over the HIT rows (a tiny fraction of the corpus).
    Callers should pre-filter benchmark ids out of `corpus` (identity
    contamination is not contamination).
    """
    corpus_sh = shingles(corpus, n, text_col, id_col)
    bench_sh = (
        shingles(bench, n, text_col, id_col)
        .withColumnRenamed(id_col, "bench_id")
    )
    hits = corpus_sh.join(F.broadcast(bench_sh), "shingle")
    return hits.groupBy(id_col).agg(
        F.countDistinct("shingle").alias("n_hit_shingles"),
        F.countDistinct("bench_id").alias("n_bench_docs"),
    )


def repetition_stats(
    df: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per doc over word n-grams:
    (doc_id, n_grams, n_distinct, top_gram_frac, dup_gram_frac).

    ``dup_gram_frac`` = fraction of n-gram occurrences that are repeats
    of an earlier occurrence (1 - distinct/total); ``top_gram_frac`` =
    the most frequent n-gram's share (Gopher filters docs whose top
    2-gram exceeds 0.20).  Docs with fewer than n tokens emit no row
    (they have no n-grams to measure — length filters catch them).

    Computed entirely per-row, zero exchange: the gram array is built
    in-projection (transform+slice, same JVM machinery as the dedup
    family), then ONE Arrow-batched pandas UDF computes
    (total, distinct, top count) per doc with ``np.unique`` — the
    groupBy(doc, gram) formulation the SQL oracle uses would shuffle
    every gram in the corpus to compute a per-doc scalar.  (A pure-HOF
    variant — array_sort + an ``aggregate`` run-length lambda — kept the
    zero-exchange shape but evaluated interpreted per element: 7.5 s vs
    0.9 s for this kernel at sf0.1, the same ~5-10x interpreted-lambda
    penalty round 3 measured on minhash.  Same trade verdict either
    way: an embarrassingly parallel map beats an O(corpus tokens)
    exchange at any scale worth having.)
    """
    # ONE JVM evaluation of the token chain, then one Arrow pass that
    # builds windows, counts distincts and drops gram-less docs — all
    # inside the kernel.  Structuring it as (projection -> filter ->
    # UDF) instead lets Catalyst inline the interpreted HOF chain into
    # the Filter AND the scan's DataFilters (each reference re-evaluates
    # the whole expression per row: measured 4.8-5.9 s vs 0.6 s at
    # sf0.1); a filter on the UDF's own output is worse still — the UDF
    # re-runs for the predicate.  mapInPandas has no sibling references
    # to duplicate, which is the whole point.
    out_schema = (
        f"{id_col} {dict(df.dtypes)[id_col]}, n_grams long, n_distinct long, "
        "top_gram_frac double, dup_gram_frac double"
    )

    def _kernel(batches):
        for pdf in batches:
            ids, ngs, nds, tops, dups = [], [], [], [], []
            for i, toks in zip(pdf[id_col], pdf["toks"]):
                m = len(toks) - n + 1
                if m < 1:
                    continue  # no n-grams to measure; length gates catch it
                grams = ["\x00".join(toks[j : j + n]) for j in range(m)]
                counts = np.unique(np.asarray(grams, dtype=object), return_counts=True)[1]
                ids.append(i)
                ngs.append(m)
                nds.append(int(counts.size))
                tops.append(round(int(counts.max()) / m, 6))
                dups.append(round(1.0 - int(counts.size) / m, 6))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_grams": np.asarray(ngs, dtype=np.int64),
                    "n_distinct": np.asarray(nds, dtype=np.int64),
                    "top_gram_frac": tops,
                    "dup_gram_frac": dups,
                }
            )

    base = spread_small_input(df).select(
        F.col(id_col), token_array(F.col(text_col)).alias("toks")
    )
    return base.mapInPandas(_kernel, schema=out_schema)


# PII patterns — the portable subset: identical parse under Java regex
# (Spark) and RE2 (DuckDB).  No backrefs, no lookaround, no \b-adjacent
# unicode classes.
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_redact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ips, redacted_md5): count PII
    matches and redact them to typed placeholders; the redacted text is
    returned as its md5 so the compare row stays small (the full
    redacted column is one `.withColumn` away for pipeline use).

    Pure column expressions — redaction as three chained regexp_replace
    (email first: an email's host part would otherwise be visible to
    the IP pattern after partial rewrites), and each COUNT runs on the
    text as it exists when its replace pass runs (email counts on the
    original, IP counts on the email-redacted text, phone counts after
    both).  Counting every pattern on the original instead can
    disagree with the redaction — a placeholder boundary ('<EMAIL>'
    before digits) satisfies a \\b the original text lacked, so the IP
    pass would redact an address n_ips reported as 0.  Staged counting
    makes counts == redactions by construction.  Embarrassingly
    parallel; no shuffle, no UDF, whole-stage codegen end to end.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    after_email = F.regexp_replace(txt, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    red = F.regexp_replace(after_ip, PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(txt, F.lit(EMAIL_RE), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(after_ip, F.lit(PHONE_RE), 0)).cast("long").alias("n_phones"),
        F.size(F.regexp_extract_all(after_email, F.lit(IPV4_RE), 0)).cast("long").alias("n_ips"),
        F.md5(red).alias("redacted_md5"),
    )


def token_budget_select(
    df: DataFrame,
    budget: int,
    score_col: str = "score",
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, cum_tokens): the highest-scoring docs whose
    cumulative token count fits ``budget`` — data selection under a
    token budget (the 'take the best N tokens' step of corpus mixing).

    There is no budgeted-prefix selection without a global order, but
    the running sum must NOT run as one global unpartitioned window
    (Exchange SinglePartition — every row through one task, the classic
    mistake ``deterministic_shuffle`` documents).  Two-pass
    partition-prefix-sum instead: a range-partitioned sort by
    (score desc, id), per-partition token totals collected to the
    driver (one tiny row per partition), then a PER-PARTITION running
    sum window plus the driver-computed prefix offset — both exchanges
    are parallel, and partitions whose offset already exceeds the
    budget are pruned before the window runs.  Ties broken by id so the
    selection is deterministic.

    The range partitioning is MATERIALIZED (localCheckpoint) before the
    totals collect: Spark's RangePartitioner seeds its boundary sampler
    with the RDD id (byteswap32(idx ^ (rdd.id << 16))), which differs
    per query execution, so re-executing the repartitionByRange plan for
    the window pass could pick DIFFERENT range boundaries once the input
    outgrows the boundary sample — the driver-computed offsets would
    then apply to the wrong partition contents.  Checkpointing pins one
    physical partitioning that both passes read.  Default is
    ``localCheckpoint`` (executor-local blocks, reclaimed by the
    ContextCleaner when the result frame is released) — fine on a
    stable cluster, but an executor loss between the checkpoint and the
    caller's action kills the job because the truncated lineage can't
    recompute the lost blocks.  Pass ``checkpoint_dir`` to stage the
    ranked partitioning to parquet instead (the same durability escape
    hatch ``connected_components`` offers) when running on preemptible
    executors; correctness doesn't depend on the staged read's physical
    layout because ``_pid`` is persisted as a COLUMN — both the totals
    aggregation and the running-sum window group by the stored value,
    not by whatever partitioning the re-read happens to have.
    """
    spark = df.sparkSession
    toks = F.size(token_array(F.col(text_col))).cast("long")
    scored = df.select(F.col(id_col), F.col(score_col), toks.alias("n_tokens"))
    p = max(2, spark.sparkContext.defaultParallelism)
    ranked = scored.repartitionByRange(
        p, F.col(score_col).desc(), F.col(id_col).asc()
    ).withColumn("_pid", F.spark_partition_id())
    if checkpoint_dir is None:
        ranked = ranked.localCheckpoint(eager=True)
    else:
        ranked = _stage_parquet(ranked, checkpoint_dir, "token_budget_ranked")
    totals = {
        int(r["_pid"]): int(r["s"])
        for r in ranked.groupBy("_pid").agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    live = [pid for pid, off in offsets.items() if off <= budget]
    if not live:
        id_type = dict(df.dtypes)[id_col]
        return spark.createDataFrame([], f"{id_col} {id_type}, n_tokens long, cum_tokens long")
    om = F.create_map(*[F.lit(x) for pid in live for x in (pid, offsets[pid])])
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.col(score_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranked.filter(F.col("_pid").isin(live))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w) + om[F.col("_pid")])
        .filter(F.col("cum_tokens") <= budget)
        .select(id_col, "n_tokens", "cum_tokens")
    )


def deterministic_shuffle(
    df: DataFrame, n_buckets: int = 8, seed: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, bucket, pos): a reproducible global shuffle of the corpus
    for training — the order is a pure function of (id, seed), never of
    input layout or partition count.

    Scale shape: a training shuffle is materialized as output FILES, so
    the operator emits the file assignment directly — ``bucket`` =
    hash % n_buckets (the output shard) and ``pos`` = rank within the
    shard (row_number windowed PER BUCKET, so the sort parallelizes
    across buckets; at 100 TB n_buckets is thousands and no single
    window sees more than a shard).  A single global row_number would
    serialize on one partition — the classic mistake this shape avoids.
    """
    h = _h64(F.col(id_col).cast("string"), seed)
    w = Window.partitionBy("bucket").orderBy("h", id_col)
    return (
        df.select(F.col(id_col), h.alias("h"))
        .withColumn("bucket", (F.col("h") % n_buckets).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "bucket", "pos")
    )


def pack_sequences(
    df: DataFrame,
    ctx_len: int = 512,
    n_buckets: int = 8,
    seed: int = 7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """GPT-style sequence packing: concatenate the (shuffled) token
    stream and split it into fixed ``ctx_len`` training chunks; docs may
    span chunk boundaries.  Per doc: (doc_id, bucket, n_tokens,
    start_offset, first_chunk, last_chunk) — enough for a writer to
    emit every chunk's members without re-tokenizing.

    The stream order is the deterministic_shuffle order (hash of id,
    seeded), bucketed so each bucket is an independent stream: the
    running token sum windows per bucket, which is exactly how a
    1000-executor packing job shards — one output stream per task, no
    global coordination.  Zero-token docs are excluded (they occupy no
    stream positions).
    """
    toks = F.size(token_array(F.col(text_col))).cast("long")
    h = _h64(F.col(id_col).cast("string"), seed)
    base = (
        df.select(F.col(id_col), toks.alias("n_tokens"), h.alias("h"))
        .filter(F.col("n_tokens") >= 1)
        .withColumn("bucket", (F.col("h") % n_buckets).cast("int"))
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return (
        base.withColumn("cum", cum)
        .select(
            F.col(id_col),
            "bucket",
            "n_tokens",
            (F.col("cum") - F.col("n_tokens")).alias("start_offset"),
            F.floor((F.col("cum") - F.col("n_tokens")) / ctx_len).cast("long").alias("first_chunk"),
            F.floor((F.col("cum") - 1) / ctx_len).cast("long").alias("last_chunk"),
        )
    )


def mixture_sample(
    df: DataFrame,
    fractions: dict[str, float],
    default: float = 0.0,
    seed: int = 5,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, source): deterministic per-source Bernoulli sampling —
    corpus mixing by source weights (upweight curated sources, thin the
    crawl).  Keep iff hash(id, seed) % 10000 < frac*10000: a pure
    per-row filter, zero shuffle, reproducible under any partitioning,
    and (unlike ``sample()``) stable across Spark versions and retries.
    """
    thresh = F.lit(int(default * 10000))
    for src, frac in sorted(fractions.items()):
        thresh = F.when(F.col(source_col) == src, F.lit(int(frac * 10000))).otherwise(thresh)
    keep = (_h64(F.col(id_col).cast("string"), seed) % 10000) < thresh
    return df.filter(keep).select(F.col(id_col), F.col(source_col))


def duplicate_span_stats(
    df: DataFrame,
    n: int = 6,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Per-doc coverage of corpus-wide duplicated n-token substrings —
    the ExactSubstr dedup signal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"), in its MapReduce shape
    rather than the paper's single-node suffix array: every n-token
    window of every doc emits a 64-bit-range rolling key; any window
    text occurring >= min_count times anywhere in the corpus (other docs
    OR a repeat within the same doc) marks its n token positions as
    duplicated.  Returns one row per affected doc:

        (doc_id, n_tokens, n_dup_windows, dup_tokens, dup_fraction)

    where dup_tokens is the size of the union of the hit windows' token
    ranges (overlapping windows counted once — a run of r consecutive
    duplicated windows covers r+n-1 tokens, not r*n).

    Scale shape: the window stream is O(corpus tokens) rows of (id, pos,
    hash) — exactly the distributed formulation's cost, and the reason
    suffix arrays don't survive 100 TB.  Per-key counts come from a
    TWO-PHASE count — ``groupBy("_h").count()`` (map-side partial
    aggregation collapses a hot key to one row per input partition
    BEFORE the exchange) joined back to the window stream — never a
    count-over-``Window.partitionBy("_h")``: the window form funnels
    every occurrence of a corpus-hot n-gram (license headers, code
    boilerplate — easily 10^7+ occurrences at 100 TB) into ONE hash
    partition and materializes the whole partition per row, while the
    join form streams it (and AQE skew-join can split the hot key's
    partition since the counts side is one row per key).  The only other
    exchange is the per-doc aggregation over HIT rows — a small
    fraction, with map-side partial aggregation in front of it — and the
    span union is a per-doc fold over sorted positions (O(doc windows),
    no re-explosion — the naive distinct-token-index expansion would
    inflate hits n x).  _h64 keys are 32-bit-range for bit-parity with
    the DuckDB oracle; at real corpus sizes widen to F.xxhash64 (full 64
    bits) to keep accidental-collision overcounts negligible.

    ``wins`` feeds BOTH the counts aggregation and the join probe, so
    by default the tokenize+hash map pass runs twice (Spark doesn't
    dedupe shared subplans) — a deliberate default: the second pass is
    embarrassingly parallel map work with zero added exchange or I/O.
    Pass ``checkpoint_dir`` to stage the window stream to parquet once
    instead, trading a write+read of O(corpus tokens) compact rows for
    the second tokenize pass — usually the right trade at 100 TB where
    tokenization CPU dominates, the wrong one for small inputs.
    """
    toks = token_array(F.col(text_col))
    base = (
        spread_small_input(df)
        .select(F.col(id_col), toks.alias("_t"))
        .withColumn("_m", F.size("_t"))
        .where(F.col("_m") >= n)
    )
    wins = base.select(
        id_col,
        "_m",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.col("_m") - (n - 1)),
                lambda i: _h64(F.concat_ws(" ", F.slice(F.col("_t"), i, n)), 0),
            )
        ).alias("_p0", "_h"),
    )
    if checkpoint_dir is not None:
        wins = _stage_parquet(wins, checkpoint_dir, "span_windows")
    counts = wins.groupBy("_h").agg(F.count(F.lit(1)).alias("_c")).where(
        F.col("_c") >= min_count
    )
    hits = wins.join(counts, "_h")
    # fold sorted 1-based window starts into union coverage: each window
    # [i, i+n-1] contributes (i+n) - max(prev_end, i) new tokens, where
    # prev_end is one past the last covered index (starts at 0).
    start = F.col("_p0") + 1
    covered = F.aggregate(
        F.sort_array(F.collect_list(start)),
        F.struct(F.lit(0).cast("long").alias("cov"), F.lit(0).cast("long").alias("end")),
        lambda st, i: F.struct(
            (st.cov + (i + n) - F.greatest(st.end, i.cast("long"))).alias("cov"),
            (i + n).cast("long").alias("end"),
        ),
        lambda st: st.cov,
    )
    return (
        hits.groupBy(id_col)
        .agg(
            F.first("_m").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_dup_windows"),
            covered.alias("dup_tokens"),
        )
        .withColumn(
            "dup_fraction",
            F.round(F.col("dup_tokens") / F.col("n_tokens"), 6),
        )
    )


GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """The Gopher document-quality rules (Rae et al. 2021, "Scaling
    Language Models: Methods, Analysis & Insights from Training Gopher",
    Appendix A1.1) as ONE row of pure column expressions per doc — the
    published heuristic battery that MassiveText (and most corpora
    since) applied before any model-based filtering:

      1. word count in [min_words, max_words]
      2. mean word length in [min_mean_word_len, max_mean_word_len]
      3. symbol-to-word ratio ('#' or '...') <= max_symbol_ratio
      4. fraction of lines starting with a bullet <= max_bullet_line_frac
      5. fraction of lines ending with '...' <= max_ellipsis_line_frac
      6. fraction of words with >= 1 alphabetic char >= min_alpha_word_frac
      7. >= min_stop_hits DISTINCT members of the 8-word stop list
         {the, be, to, of, and, that, have, with}

    Returns (id, n_words, mean_word_len, symbol_ratio, bullet_line_frac,
    ellipsis_line_frac, alpha_word_frac, stop_hits, keep) — per-signal
    values so callers can re-threshold without recomputing, plus the
    conjunctive keep flag.

    Scale shape: zero exchange — every signal is an expression over the
    row's own text (split / filter / aggregate higher-order functions,
    all JVM-side), so the op is a narrow map fused into whatever scan
    feeds it, with nothing to tune at 100 TB.  Complements
    ``repetition_stats`` (the other half of Gopher A1.1) which needs
    its own pass only because n-gram repetition is not expressible as a
    per-row HOF chain over *words*.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(F.trim(txt), r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words)
    n_div = F.greatest(n_words, F.lit(1))
    sum_wl = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    mean_wl = sum_wl / n_div
    n_hash = F.length(txt) - F.length(F.regexp_replace(txt, "#", ""))
    n_ellipsis = F.floor(
        (F.length(txt) - F.length(F.regexp_replace(txt, r"\.\.\.", ""))) / F.lit(3)
    )
    symbol_ratio = (n_hash + n_ellipsis) / n_div
    lines = F.filter(F.split(txt, "\n"), lambda x: F.trim(x) != F.lit(""))
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = (
        F.size(F.filter(lines, lambda x: F.trim(x).rlike(r"^[-*•]"))) / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda x: F.trim(x).rlike(r"\.\.\.$"))) / n_lines
    )
    alpha_frac = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))) / n_div
    # strip punctuation before the stop-list match (same normalization
    # as c4_rules' blocklist): 'that.' / '(with' must still count as
    # stop-word presence — the published rule is about the words, and an
    # exact whitespace-token match would fail fluent docs whose stop
    # words precede punctuation
    stop_hits = F.size(
        F.array_intersect(
            F.transform(words, lambda w: F.regexp_replace(F.lower(w), "[^a-z0-9]", "")),
            F.array(*[F.lit(s) for s in GOPHER_STOPS]),
        )
    )
    out = df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.cast("long").alias("stop_hits"),
    )
    keep = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    return out.withColumn("keep", keep)


C4_BAD_WORDS = ["badword1", "badword2"]  # placeholder for the published
# blocklist ("List of Dirty, Naughty, Obscene...") — the list itself is
# a data artifact, not an algorithm; callers pass their own


def c4_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 3,
    min_sentences: int = 5,
    bad_words: list[str] | None = None,
) -> DataFrame:
    """The C4 cleaning heuristics (Raffel et al. 2020, "Exploring the
    Limits of Transfer Learning...", §2.2) as ONE row of pure column
    expressions per doc — the other canonical published battery next to
    :func:`gopher_rules`:

      1. only lines ending in a terminal punctuation mark ('.', '!',
         '?', '"') count as retained
      2. retained lines must have >= min_line_words words; lines
         containing the word 'javascript' are dropped
      3. pages need >= min_sentences sentences (counted as terminal
         marks across retained lines — a documented stand-in for the
         paper's sentence tokenizer, which is a model artifact)
      4. pages containing 'lorem ipsum' (case-insensitive) are dropped
      5. pages containing a curly brace '{' are dropped (code leakage)
      6. pages with any blocklist word are dropped (``bad_words``; the
         published list is a data artifact — parameterized, tiny
         placeholder default)

    Returns (id, n_lines, n_retained_lines, retained_line_frac,
    n_sentences, has_lorem_ipsum, has_brace, bad_word_hits, keep) —
    per-signal values so callers can re-threshold without recomputing.
    The paper's three-sentence-span dedup step lives in
    :func:`duplicate_span_stats` / the near-dup family, and language
    filtering in ``textops.lang_id`` — composition, not omission.

    Scale shape: zero exchange, same as gopher_rules — every signal is
    a JVM-side expression over the row's own text, a narrow map fused
    into the feeding scan."""
    bw = [w.lower() for w in (bad_words if bad_words is not None else C4_BAD_WORDS)]
    txt = F.coalesce(F.col(text_col), F.lit(""))
    low = F.lower(txt)
    lines = F.filter(F.split(txt, "\n"), lambda x: F.trim(x) != F.lit(""))
    n_lines = F.size(lines)
    n_div = F.greatest(n_lines, F.lit(1))
    kept = F.filter(
        lines,
        lambda x: F.trim(x).rlike(r'[.!?"]$')
        & (
            F.size(F.filter(F.split(F.trim(x), r"\s+"), lambda w: w != F.lit("")))
            >= F.lit(min_line_words)
        )
        & ~F.lower(x).rlike(r"\bjavascript\b"),
    )
    n_kept = F.size(kept)
    # sentences ~ terminal marks across retained lines
    joined = F.array_join(kept, "\n")
    n_sent = F.length(joined) - F.length(F.regexp_replace(joined, r"[.!?]", ""))
    has_lorem = low.contains("lorem ipsum")
    has_brace = txt.contains("{")
    words_low = F.transform(
        F.filter(F.split(F.trim(low), r"\s+"), lambda w: w != F.lit("")),
        lambda w: F.regexp_replace(w, r"[^a-z0-9]", ""),
    )
    bad_hits = F.size(F.array_intersect(words_low, F.array(*[F.lit(w) for w in bw])))
    out = df.select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_retained_lines"),
        F.round(n_kept / n_div, 6).alias("retained_line_frac"),
        n_sent.cast("long").alias("n_sentences"),
        has_lorem.cast("int").alias("has_lorem_ipsum"),
        has_brace.cast("int").alias("has_brace"),
        bad_hits.cast("long").alias("bad_word_hits"),
    )
    keep = (
        (F.col("n_retained_lines") >= 1)
        & (F.col("n_sentences") >= min_sentences)
        & (F.col("has_lorem_ipsum") == 0)
        & (F.col("has_brace") == 0)
        & (F.col("bad_word_hits") == 0)
    )
    return out.withColumn("keep", keep.cast("int"))


def remove_duplicate_spans(
    df: DataFrame,
    n: int = 6,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """ExactSubstr DEDUP — the cut step of Lee et al. 2022 (§3 "we
    remove all but one of the duplicated substrings"), composing with
    :func:`duplicate_span_stats` which only reports the signal: every
    corpus-wide duplicated n-token window is removed from every
    occurrence EXCEPT the canonical first one (minimum (doc_id,
    position) — deterministic, no coordination beyond the one window
    already shuffled).  Overlapping cut windows merge, so a run of r
    consecutive duplicated windows removes r+n-1 tokens once.

    Returns (doc_id, text, n_tokens, removed_tokens) for EVERY input
    doc; ``text`` is the TOKEN-NORMALIZED document (the same analyzer
    chain the stats op counts with) with cut spans removed — the paper
    also operates on tokenized text; callers needing original bytes
    should treat this as the training-surface text, not a byte patch.

    Scale shape: identical to duplicate_span_stats — a TWO-PHASE
    per-key aggregation (``groupBy("_h")`` computing both the count and
    the first-occurrence keeper as ``min(struct(doc_id, pos))``, with
    map-side partial aggregation collapsing hot keys before the
    exchange) joined back to the window stream, never a
    count/row_number-over-``Window.partitionBy("_h")`` — the window form
    funnels a corpus-hot n-gram's every occurrence into one partition
    and materializes it whole (see duplicate_span_stats).  Cut rows are
    a small fraction, and the interval merge is a per-doc fold over
    sorted starts.  The final pass re-derives each doc's token array in
    the same projection that filters it (no second corpus shuffle; docs
    without cuts pass through untouched via the left join).  As in
    duplicate_span_stats, the window stream feeds both the key
    aggregation and the join probe — recomputed by default (pure
    map-side work), staged once to parquet when ``checkpoint_dir`` is
    given.
    """
    toks = token_array(F.col(text_col))
    base = (
        spread_small_input(df)
        .select(F.col(id_col), toks.alias("_t"))
        .withColumn("_m", F.size("_t"))
    )
    wins = base.where(F.col("_m") >= n).select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.col("_m") - (n - 1)),
                lambda i: _h64(F.concat_ws(" ", F.slice(F.col("_t"), i, n)), 0),
            )
        ).alias("_p0", "_h"),
    )
    if checkpoint_dir is not None:
        wins = _stage_parquet(wins, checkpoint_dir, "span_windows_cut")
    keyagg = (
        wins.groupBy("_h")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.min(F.struct(F.col(id_col), F.col("_p0"))).alias("_keep"),
        )
        .where(F.col("_c") >= min_count)
    )
    cuts = wins.join(keyagg, "_h").where(
        ~(
            (F.col(id_col) == F.col("_keep").getField(id_col))
            & (F.col("_p0") == F.col("_keep").getField("_p0"))
        )
    )
    # merge sorted 1-based starts into disjoint [s, e) intervals: starts
    # ascend, so any overlap is with the last interval in the accumulator
    start = F.col("_p0") + 1
    iv_t = "array<struct<s:bigint,e:bigint>>"
    last = lambda acc: F.element_at(acc, -1)  # noqa: E731
    intervals = F.aggregate(
        F.sort_array(F.collect_list(start)),
        F.array().cast(iv_t),
        lambda acc, i: F.when(
            (F.size(acc) > 0) & (i.cast("long") <= last(acc)["e"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        last(acc)["s"].alias("s"),
                        F.greatest(last(acc)["e"], (i + n).cast("long")).alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(
                    F.struct(i.cast("long").alias("s"), (i + n).cast("long").alias("e"))
                ),
            )
        ),
    )
    per_doc = cuts.groupBy(id_col).agg(intervals.alias("_iv"))
    joined = base.join(per_doc, id_col, "left")
    kept = F.when(
        F.col("_iv").isNull(), F.col("_t")
    ).otherwise(
        F.filter(
            F.col("_t"),
            lambda _tok, idx: ~F.exists(
                F.col("_iv"), lambda iv: ((idx + 1) >= iv["s"]) & ((idx + 1) < iv["e"])
            ),
        )
    )
    return joined.select(
        F.col(id_col),
        F.array_join(kept, " ").alias("text"),
        F.col("_m").cast("long").alias("n_tokens"),
        (F.col("_m") - F.size(kept)).cast("long").alias("removed_tokens"),
    )
