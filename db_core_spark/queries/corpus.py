"""Corpus-quality operators for LLM training-data pipelines: benchmark
contamination, within-document repetition, Gopher-style heuristic quality
rules, and a unigram-LM perplexity proxy.

Goal-derived (BASELINE.json north star; SURVEY.md §2C — the reference has no
relational operators). These are the filters a 100 TB pre-training pipeline
runs between raw crawl and tokenization: every one is expressed as
whole-stage-codegen'd explode/join/aggregate chains — no Python in the hot
path, one bounded shuffle per operator, and the small side (benchmark shingle
set, vocabulary) broadcast so the corpus never reshuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from db_core_spark.operators.litframe import literal_frame
from db_core_spark.functions.text import EN_STOPWORDS, shingle_posting
from db_core_spark.registry import query
from db_core_spark.tables import table

# Benchmark/eval holdout: docs from these sources play the role of an eval
# benchmark whose n-grams must not leak into training data. Fixture sources
# are src1..src20, so this is a ~10% holdout.
BENCH_SOURCES = ("src1", "src2")

_TOKS_5GRAM = """
    toks AS (
      SELECT doc_id, source, string_split_regex(text, '\\s+') AS t FROM documents),
    docs AS (
      SELECT doc_id, source,
             list_distinct(list_transform(range(1, len(t) - 3),
                                          i -> array_to_string(t[i:i+4], ' '))) AS w
      FROM toks),
    posting AS (SELECT doc_id, source, UNNEST(w) AS sh FROM docs)
"""


@query(
    "contamination_ngram_overlap",
    oracle="WITH "
    + _TOKS_5GRAM
    + """,
    bench AS (SELECT DISTINCT sh FROM posting WHERE source IN ('src1', 'src2')),
    train AS (SELECT doc_id, sh FROM posting WHERE source NOT IN ('src1', 'src2')),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM train GROUP BY 1),
    hits AS (
      SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit
      FROM train t JOIN bench b USING (sh) GROUP BY 1)
    SELECT s.doc_id, s.n_sh, h.n_hit,
           ROUND(h.n_hit * 1.0 / s.n_sh, 6) AS contamination
    FROM sizes s JOIN hits h ON s.doc_id = h.doc_id
    """,
    category="llm",
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: for every training document, the
    fraction of its distinct 5-gram shingles that also occur in the held-out
    benchmark corpus (sources src1/src2). The decontamination step every
    serious pre-training pipeline runs so eval benchmarks don't leak into
    training data (n-gram overlap is the standard check, e.g. GPT-3 appendix
    C / PaLM's 13-gram rule; 5-gram here because fixture docs are 10-100
    tokens).

    Scale shape: the benchmark shingle set is tiny relative to the corpus
    (eval suites are MBs, corpora are TBs) — build it once, distinct it, and
    BROADCAST it against the training posting list, so the 100 TB side is
    filtered map-side with zero extra shuffle; the only shuffle is the
    per-doc count aggregation the posting list already needs. Only
    contaminated docs (>=1 hit) are emitted."""
    d = table(spark, sf_dir, "documents")
    posting = shingle_posting(d, n=5).distinct()
    # benchmark membership by doc_id list (broadcast both ways: the holdout
    # id list is tiny, so the train-side anti join is map-side too)
    bench_docs = d.filter(F.col("source").isin(*BENCH_SOURCES)).select("doc_id")
    bench = (
        posting.join(F.broadcast(bench_docs), "doc_id", "left_semi")
        .select("sh")
        .distinct()
    )
    train = posting.join(F.broadcast(bench_docs), "doc_id", "left_anti")
    sizes = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    hits = (
        train.join(F.broadcast(bench), "sh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        sizes.join(hits, "doc_id")
        .select(
            "doc_id",
            "n_sh",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_sh"), 6).alias("contamination"),
        )
    )


@query(
    "doc_repetition_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents),
    grams AS (
      SELECT doc_id,
             UNNEST(list_transform(range(1, len(t) - 1),
                                   i -> array_to_string(t[i:i+2], ' '))) AS sh
      FROM toks),
    per_gram AS (
      SELECT doc_id, sh, COUNT(*) AS c FROM grams GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_grams,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           ROUND(1.0 - COUNT(*) * 1.0 / SUM(c), 6) AS dup_frac,
           CAST(MAX(c) AS BIGINT) AS top_gram_n
    FROM per_gram GROUP BY doc_id
    """,
    category="llm",
)
def doc_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition scoring: duplicate-3-gram fraction and the
    hottest single 3-gram count per document — the Gopher/FineWeb 'repetition
    filter' signal that catches boilerplate, keyword stuffing, and decoding
    loops. Counts NON-distinct shingles: dup_frac = 1 - distinct/total.

    One posting explode, one (doc, gram) count, one per-doc fold — the
    second aggregation reuses the first's hash partitioning on doc_id
    (Catalyst plans them back to back without a second exchange of the wide
    data). No arrays ride the shuffle."""
    d = table(spark, sf_dir, "documents")
    grams = shingle_posting(d, n=3)  # NOT distinct: repetition is the signal
    per_gram = grams.groupBy("doc_id", "sh").agg(F.count(F.lit(1)).alias("c"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(1.0 - F.count(F.lit(1)) / F.sum("c"), 6).alias("dup_frac"),
        F.max("c").alias("top_gram_n"),
    )


_STOPWORD_SQL_LIST = "(" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + ")"


@query(
    "gopher_quality_rules",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split_regex(text, '\\s+')) AS tok FROM documents),
    m AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             ROUND(AVG(len(tok)), 6) AS mean_word_len,
             CAST(SUM(CASE WHEN tok IN {_STOPWORD_SQL_LIST} THEN 1 ELSE 0 END) AS BIGINT)
               AS stop_hits
      FROM toks GROUP BY doc_id)
    SELECT doc_id, n_words, mean_word_len, stop_hits,
           (n_words BETWEEN 20 AND 1000)
             AND (mean_word_len BETWEEN 2 AND 8)
             AND stop_hits >= 1 AS passes
    FROM m
    """,
    category="llm",
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style heuristic quality gate (Rae et al. 2021 §A1.1 family):
    word-count bounds, mean-word-length bounds, and stopword presence, folded
    into a single boolean verdict per document. These cheap structural rules
    are the first filter stage of every crawl pipeline — they run at full
    scan speed (one explode + one hash aggregate, all codegen) and drop the
    bulk of junk before any expensive model-based scoring sees it.

    mean word length averages INTEGER lengths, so the sum is exact and the
    rounded average is bit-identical across engines and partitionings."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("tok"))
    m = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.round(F.avg(F.length("tok")), 6).alias("mean_word_len"),
        F.sum(F.when(F.col("tok").isin(*EN_STOPWORDS), 1).otherwise(0)).alias("stop_hits"),
    )
    return m.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "stop_hits",
        (
            F.col("n_words").between(20, 1000)
            & F.col("mean_word_len").between(2, 8)
            & (F.col("stop_hits") >= 1)
        ).alias("passes"),
    )


@query(
    "perplexity_unigram_proxy",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split_regex(text, '\\s+')) AS tok FROM documents),
    vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    total AS (SELECT SUM(c) AS n FROM vocab)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(-LN(v.c * 1.0 / total.n)), 6) AS avg_neg_logp
    FROM toks t JOIN vocab v USING (tok) CROSS JOIN total
    GROUP BY t.doc_id
    """,
    category="llm",
)
def perplexity_unigram_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity proxy: score every document by the mean negative
    log-probability of its tokens under the corpus's own unigram
    distribution — the cheap stand-in for KenLM-perplexity filtering (CCNet
    et al.): gibberish and rare-token soup scores high, templated boilerplate
    scores low.

    Scale shape: the vocabulary is the classic small-side aggregate (even at
    100 TB a unigram vocab is millions of rows, not billions) — build it with
    one hash aggregate, fold the scalar total in via a 1-row cross join, and
    BROADCAST the scored vocab back onto the token stream, so the corpus-side
    pass is map-only and the only wide shuffle is the final per-doc average."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    scored = vocab.crossJoin(F.broadcast(total)).select(
        "tok", (-F.log(F.col("c") / F.col("n"))).alias("neg_logp")
    )
    return (
        toks.join(F.broadcast(scored), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("neg_logp"), 6).alias("avg_neg_logp"),
        )
    )


BPE_MERGES = 20


def bpe_train_reference(word_freqs: dict[str, int], n_merges: int = BPE_MERGES):
    """Pure-Python reference BPE trainer (the pytest oracle for
    `bpe_train_merges`): greedy highest-frequency pair, ties broken by
    lexicographically smallest (left, right), merges applied left-to-right
    non-overlapping."""
    segs = {w: list(w) for w in word_freqs}
    merges = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (left, right), freq = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = left + right
        for w in segs:
            s, out, i = segs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
        merges.append((rank, left, right, freq))
    return merges


#: driver rounds taken by the last bpe_train_merges call (pytest asserts the
#: batched selector keeps this far below the merge count)
BPE_LAST_ROUNDS = 0


def _bpe_chain_sql(n_merges: int) -> str:
    """The shared 20-round BPE training chain as chained MATERIALIZED CTEs —
    the SEQUENTIAL reference algorithm in pure SQL: each round counts
    adjacent pairs (exact integer sums), picks the argmax with the
    lexicographic tiebreak (a subquery — no data knowledge needed), and
    rewrites every word with leftmost-nonoverlapping merge semantics via
    islands-parity (candidate positions at consecutive indices pair off
    even offsets — the run case l == r; isolated candidates always merge).
    Everything is integer/string arithmetic, so the replay is EXACT, and
    the Spark side's batched head+tail simulation is therefore value-hash
    checked against the sequential algorithm it claims to equal (the same
    property the parity pytest pins, now driver-checked too)."""
    parts = ["""
    WITH v0 AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
             string_split(word, '') AS syms
      FROM (SELECT UNNEST(string_split_regex(text, '\\s+')) AS word
            FROM documents)
      GROUP BY word)"""]
    for r in range(n_merges):
        parts.append(f""",
    w{r} AS MATERIALIZED (
      SELECT word, freq, i, s,
             LEAD(s) OVER (PARTITION BY word ORDER BY i) AS s2
      FROM (SELECT word, freq,
                   UNNEST(range(1, len(syms) + 1)) AS i,
                   UNNEST(syms) AS s
            FROM v{r})),
    pick{r} AS MATERIALIZED (
      SELECT s AS l, s2 AS r, s || s2 AS m, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM w{r} WHERE s2 IS NOT NULL
      GROUP BY s, s2 ORDER BY cnt DESC, l, r LIMIT 1),
    merged{r} AS MATERIALIZED (
      SELECT word, i FROM (
        SELECT word, i,
               ROW_NUMBER() OVER (PARTITION BY word, isl ORDER BY i) AS k
        FROM (
          SELECT word, i,
                 i - ROW_NUMBER() OVER (PARTITION BY word ORDER BY i) AS isl
          FROM w{r}
          WHERE s = (SELECT l FROM pick{r})
            AND s2 = (SELECT r FROM pick{r})))
      WHERE k % 2 = 1),
    v{r + 1} AS MATERIALIZED (
      SELECT w.word, w.freq,
             LIST(CASE WHEN mc.word IS NOT NULL
                       THEN (SELECT m FROM pick{r}) ELSE w.s END
                  ORDER BY w.i) AS syms
      FROM w{r} w
      LEFT JOIN merged{r} mc ON mc.word = w.word AND mc.i = w.i
      LEFT JOIN merged{r} pv ON pv.word = w.word AND pv.i = w.i - 1
      WHERE pv.word IS NULL
      GROUP BY w.word, w.freq)""")
    return "".join(parts)


def _bpe_train_oracle(n_merges: int | None = None) -> str:
    n_merges = BPE_MERGES if n_merges is None else n_merges
    ranks = "\n      UNION ALL ".join(
        f'SELECT {r} AS rk, l, r AS rr, cnt FROM pick{r}' for r in range(n_merges)
    )
    return f"""{_bpe_chain_sql(n_merges)},
    allpicks AS (
      {ranks})
    SELECT CAST(rk AS INT) AS rank, l AS "left", rr AS "right",
           cnt AS pair_freq
    FROM allpicks
    """


def _bpe_apply_oracle(n_merges: int | None = None) -> str:
    n_merges = BPE_MERGES if n_merges is None else n_merges
    return f"""{_bpe_chain_sql(n_merges)},
    doc_words AS (
      SELECT doc_id, UNNEST(string_split_regex(text, '\\s+')) AS word
      FROM documents)
    SELECT d.doc_id,
           CAST(SUM(len(v.syms)) AS BIGINT) AS n_bpe_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           ROUND(SUM(len(v.syms)) * 1.0 / COUNT(*), 6) AS tokens_per_word
    FROM doc_words d JOIN v{n_merges} v ON v.word = d.word
    GROUP BY d.doc_id
    """



@query("bpe_train_merges", oracle=_bpe_train_oracle(), category="llm")
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE (byte-pair-encoding) merge-table training — the
    tokenizer-fitting step of every LLM data pipeline. Greedy algorithm:
    count adjacent symbol pairs weighted by word frequency, merge the most
    frequent pair (ties: lexicographically smallest), repeat for 20 ranks.

    Scale shape — the part that matters at 100 TB: the corpus collapses to a
    (word, freq) vocabulary with ONE distributed aggregation (the classic
    word-count; vocab is millions of rows where the corpus is billions), and
    all merge iterations run over that small vocab table — pair counting
    is an explode + hash aggregate per round and the merge rewrite is a
    per-word array fold. The corpus is never re-read after the first pass.

    Driver rounds are BATCHED (the standard distributed-BPE trick, without
    which a real 32k-merge vocab would mean 32k sequential collect+replan
    round-trips), with a HEAD + TAIL decomposition. Each round collects
    (1) the top-64 pair counts, (2) the exact trigram counts adjacent to
    those pairs, and (3) the top `BPE_TOP_WORDS` heavy-hitter words in
    full. Pair counts split exactly: total = head (from the collected
    words, re-derivable after every simulated merge, so exact at ANY
    depth) + tail (everything else). The tail residuals are maintained
    through each simulated pick by trigram accounting — merging (l1, r1)
    with l1 != r1 destroys exactly TRI(l2, l1, r1) occurrences of
    (l2, l1) and TRI(l1, r1, r2) of (r1, r2), and creates (x, l1r1) /
    (l1r1, y) with exactly the corresponding trigram counts — exact while
    every consulted trigram is fresh (no symbol consumed earlier) and the
    pick is chain-unambiguous; anything uncertain demotes to an upper
    bound, and the simulation stops the moment the best fully-exact
    candidate no longer strictly beats every bound. When the head covers
    the whole vocabulary the tail is empty and a single round decides
    every merge; at real scale correctness is unchanged and round count
    degrades gracefully with tail mass. The rewrite applies the round's
    picks IN RANK ORDER as chained array folds inside ONE Spark job.
    Ranks, ties, and recorded frequencies match the one-at-a-time
    reference EXACTLY — pytest pins bit-equality against the pure-Python
    trainer (also under a head too small to cover the vocab) and asserts
    the round count stays <= 5 for the fixture. Deterministic: no RNG,
    total tie-break order. Not SQL-expressible (data-dependent rewrite
    rounds), so rows-only for the driver."""
    global BPE_LAST_ROUNDS
    d = table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split(F.col("text"), r"\s+")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("syms", F.split(F.col("word"), ""))
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, int]] = []
    rounds = 0
    while len(merges) < BPE_MERGES:
        pairs = (
            vocab.filter(F.size("syms") >= 2)  # 1-symbol words have no pairs
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(syms[i-1] AS l, syms[i] AS r))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
        )
        cands = pairs.orderBy(
            F.col("cnt").desc(), F.col("l"), F.col("r")
        ).limit(64).collect()
        if not cands:
            break
        rounds += 1
        # threshold T: every uncollected pair counts <= T (0 when the
        # collected set is complete); ties at T are not decidable here
        if len(cands) == 64:
            T = int(cands[-1].cnt)
            cands = [c for c in cands if int(c.cnt) > T] or cands[:1]
        else:
            T = 0
        # exact trigram counts adjacent to the candidate pairs — the only
        # patterns through which one merge can disturb another's count
        tri = vocab.filter(F.size("syms") >= 3).select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(2, size(syms) - 1), "
                    "i -> struct(syms[i-2] AS a, syms[i-1] AS b, syms[i] AS c))"
                )
            ).alias("t"),
        )
        keys = [f"{c.l}\x00{c.r}" for c in cands]
        tri_cnt = {
            (row.a, row.b, row.c): int(row.s)
            for row in tri.groupBy(
                F.col("t.a").alias("a"),
                F.col("t.b").alias("b"),
                F.col("t.c").alias("c"),
            )
            .agg(F.sum("freq").alias("s"))
            .filter(
                F.concat_ws("\x00", "b", "c").isin(keys)
                | F.concat_ws("\x00", "a", "b").isin(keys)
            )
            .collect()
        }
        head_rows = (
            vocab.orderBy(F.col("freq").desc(), "word")
            .select("freq", "syms")
            .limit(BPE_TOP_WORDS)
            .collect()
        )
        head = [(list(r.syms), int(r.freq)) for r in head_rows]
        complete = len(head_rows) < BPE_TOP_WORDS
        picks = _bpe_simulate_round(
            {(c.l, c.r): int(c.cnt) for c in cands},
            tri_cnt,
            T,
            BPE_MERGES - len(merges),
            head,
            complete,
        )
        if not picks:
            # Exact one-at-a-time fallback: the simulation could not admit
            # even one pick (bounds blocked the best exact candidate — e.g.
            # a loose h+T upper for an uncollected-tail pair, or stacked
            # anonymous creations). cands[0] is ALWAYS the exact sequential
            # next merge: the collect is a GLOBAL sort on (cnt DESC, l, r),
            # so any pair ordering before it would itself be in the top-64.
            # Guarantees progress — batching degrades to the old 1-pick
            # round, never to a silently truncated merge table.
            picks = [(cands[0].l, cands[0].r, int(cands[0].cnt))]
        for l, r, cnt in picks:
            merges.append((len(merges), l, r, cnt))
        # apply the round's picks IN RANK ORDER: one chained fold per pick
        # (innermost = earliest rank), single Spark job, zero extra driver
        # round-trips
        expr_sql = "syms"
        for l, r, _ in picks:
            lq = l.replace("\\", "\\\\").replace("'", "\\'")
            rq = r.replace("\\", "\\\\").replace("'", "\\'")
            mq = (l + r).replace("\\", "\\\\").replace("'", "\\'")
            expr_sql = (
                f"aggregate({expr_sql}, CAST(array() AS array<string>), "
                f"(acc, x) -> CASE WHEN size(acc) > 0 AND "
                f"element_at(acc, -1) = '{lq}' AND x = '{rq}' "
                f"THEN concat(slice(acc, 1, size(acc) - 1), array('{mq}')) "
                f"ELSE concat(acc, array(x)) END)"
            )
        vocab = vocab.withColumn("syms", F.expr(expr_sql)).localCheckpoint(eager=False)
    BPE_LAST_ROUNDS = rounds
    return literal_frame(
        spark, merges, "rank int, left string, right string, pair_freq bigint"
    )


#: heavy-hitter word budget for the driver-side head simulation
BPE_TOP_WORDS = 512


def _head_pair_counts(head) -> dict[tuple[str, str], int]:
    d: dict[tuple[str, str], int] = {}
    for syms, f in head:
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            d[p] = d.get(p, 0) + f
    return d


def _head_tri_counts(head) -> dict[tuple[str, str, str], int]:
    d: dict[tuple[str, str, str], int] = {}
    for syms, f in head:
        for i in range(len(syms) - 2):
            t = (syms[i], syms[i + 1], syms[i + 2])
            d[t] = d.get(t, 0) + f
    return d


def _merge_word(syms: list[str], l: str, r: str, m: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(m)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _bpe_simulate_round(
    total_pairs: dict[tuple[str, str], int],
    tri_total: dict[tuple[str, str, str], int],
    T: int,
    max_picks: int,
    head: list[tuple[list[str], int]],
    complete: bool,
) -> list[tuple[str, str, int]]:
    """Driver-side exact simulation of sequential BPE picks for one round.

    HEAD: the collected heavy-hitter words, whose pair counts are
    re-derived after every simulated merge — exact at any depth. TAIL:
    everything else, maintained through trigram accounting on the
    residual counts (``total - head``): per pick (l1, r1) with l1 != r1,

    - destroyed: tail(l2, l1) -= TAILTRI(l2, l1, r1); tail(r1, r2) -=
      TAILTRI(l1, r1, r2) — exact while the trigram is fresh (no symbol
      of it consumed earlier) and single-sided;
    - created: tail(x, l1r1) = TAILTRI(x, l1, r1) / tail(l1r1, y) =
      TAILTRI(l1, r1, y) — exact under the same freshness rule and
      x != r1 / y != l1;
    - anything uncertain (chain-ambiguous l == r, created-symbol picks,
      stale trigrams, double-sided overlap) demotes the affected tail
      residual to an upper BOUND — counts and trigram counts only ever
      decrease, so stale values stay valid bounds; uncertain CREATIONS
      (whose landing identity can be ambiguous when a flanking symbol may
      itself have merged) feed one scalar ``anon_bound`` — accumulated by
      SUM, not max, because several anonymous masses can land on the SAME
      pair identity and the safe bound on any one identity is their joint
      mass. When the bounds block even the round's first pick, the caller
      falls back to the always-exact one-at-a-time top-1 pick, so a loose
      bound costs rounds, never correctness.

    A pick is admitted only while its exact total strictly beats the
    upper bound of every non-exact candidate (dirty tails; uncollected
    originals <= T; anonymous creations <= anon_bound; with a
    known-identity bound, a tie resolves by the sequential lexicographic
    rule). ``complete=True`` (head == whole vocabulary) empties the tail
    and the simulation runs to max_picks.
    """
    picks: list[tuple[str, str, int]] = []
    consumed: set[str] = set()
    created_syms: set[str] = set()
    anon_bound = 0
    head = [(list(syms), f) for syms, f in head]

    if complete:
        tail_exact: dict[tuple[str, str], int] = {}
        tail_dirty: dict[tuple[str, str], int] = {}
        tail_tri: dict[tuple[str, str, str], int] = {}
        T = 0
    else:
        hp0 = _head_pair_counts(head)
        ht0 = _head_tri_counts(head)
        tail_exact = {
            p: c - hp0.get(p, 0) for p, c in total_pairs.items()
        }
        tail_dirty = {}
        tail_tri = {t: s - ht0.get(t, 0) for t, s in tri_total.items()}

    while len(picks) < max_picks:
        hp = _head_pair_counts(head)
        exact_totals: dict[tuple[str, str], int] = {}
        uppers: dict[tuple[str, str], int] = {}
        for p in set(hp) | set(tail_exact) | set(tail_dirty):
            h = hp.get(p, 0)
            if p in tail_exact:
                exact_totals[p] = h + tail_exact[p]
            elif complete:
                exact_totals[p] = h
            elif p in tail_dirty:
                uppers[p] = h + tail_dirty[p]
            else:
                uppers[p] = h + T  # unknown tail, bounded by the cut
        if not exact_totals:
            break
        (l1, r1), cnt = min(
            exact_totals.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if not complete:
            # anonymous mass: identity unknown, any tie is unsafe
            if cnt <= T or cnt <= anon_bound:
                break
            blocked = any(
                u > cnt or (u == cnt and q < (l1, r1))
                for q, u in uppers.items()
                if q != (l1, r1)
            )
            if blocked:
                break
        picks.append((l1, r1, cnt))
        mk = l1 + r1
        # HEAD: apply the merge to the collected words (exact, any depth)
        head = [
            (_merge_word(syms, l1, r1, mk) if l1 in syms else syms, f)
            for syms, f in head
        ]
        if not complete:
            tail_exact.pop((l1, r1), None)
            tail_dirty.pop((l1, r1), None)
            chain_pick = (
                l1 == r1 or l1 in created_syms or r1 in created_syms
            )
            stale_pick = l1 in consumed or r1 in consumed
            # destroyed tail occurrences of (x, l1) and (r1, y)
            for (l2, r2), c2 in list(tail_exact.items()):
                s1 = r2 == l1
                s2 = l2 == r1
                if not s1 and not s2:
                    continue
                if chain_pick or stale_pick or (s1 and s2):
                    ok = False
                elif s1:
                    ok = l2 not in created_syms and l2 not in consumed
                    dec = tail_tri.get((l2, l1, r1), 0)
                else:
                    ok = r2 not in created_syms and r2 not in consumed
                    dec = tail_tri.get((l1, r1, r2), 0)
                if ok:
                    tail_exact[(l2, r2)] = c2 - dec
                else:
                    bound = tail_exact.pop((l2, r2))
                    tail_dirty[(l2, r2)] = max(
                        tail_dirty.get((l2, r2), 0), bound
                    )
                    # its destroyed occurrences re-emerge as creations of
                    # ambiguous identity (the flank may itself merge)
                    anon_bound += bound
            # creations seeded from already-dirty pairs adjacent to the pick
            for (l2, r2), b in tail_dirty.items():
                if r2 == l1 or l2 == r1:
                    anon_bound += b
            if not chain_pick:
                # created tail pairs around the new symbol: exact when the
                # flank is fresh (it provably did not merge), else anonymous
                for (a, b, c), s in tail_tri.items():
                    if s <= 0:
                        continue
                    if (b, c) == (l1, r1):
                        if stale_pick or a == r1 or a in consumed:
                            anon_bound += s
                        else:
                            tail_exact[(a, mk)] = s
                    if (a, b) == (l1, r1):
                        if stale_pick or c == l1 or c in consumed:
                            anon_bound += s
                        else:
                            tail_exact[(mk, c)] = s
                # depth-2 creations (merged-next-to-merged) and same-pair
                # chains descend from the trigrams flanking this pick
                for lp, rp, _c in picks[:-1]:
                    anon_bound += tail_tri.get((rp, l1, r1), 0)
                    anon_bound += tail_tri.get((l1, r1, lp), 0)
                anon_bound += tail_tri.get((r1, l1, r1), 0)
        consumed |= {l1, r1}
        created_syms.add(mk)
    return picks


def bpe_apply_reference(text: str, merges) -> list[str]:
    """Pure-Python reference for `bpe_apply_tokenize`: apply the merge table
    in rank order to every whitespace word, return the token list."""
    out = []
    for w in text.split():
        s = list(w)
        for _rank, left, right, _freq in merges:
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            s = res
        out.extend(s)
    return out


@query("bpe_apply_tokenize", oracle=_bpe_apply_oracle(), category="llm")
def bpe_apply_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained BPE merge table to the corpus and report per-doc
    token counts — the tokenization pass that follows `bpe_train_merges` in
    a real pipeline (token counts drive packing, pricing, and curriculum
    decisions). The merge table is tiny and becomes 20 chained array-fold
    expressions compiled into ONE projection over the corpus: tokenization
    is embarrassingly parallel, zero shuffles before the final stats
    aggregate, no Python in the row path. Rows-only for the driver (the
    fold chain is not DuckDB-expressible); pytest checks exact token-list
    equality with the reference implementation."""
    merges = [
        (r.rank, r.left, r.right, r.pair_freq)
        for r in bpe_train_merges(spark, sf_dir).collect()
    ]
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("word")
    ).withColumn("syms", F.split(F.col("word"), ""))
    expr = "syms"
    for _rank, left, right, _freq in merges:
        # escape backslashes BEFORE quotes (same hardening as the train-side
        # fold) — a merge symbol containing a backslash would otherwise
        # produce a malformed SQL string literal
        lq = left.replace("\\", "\\\\").replace("'", "\\'")
        rq = right.replace("\\", "\\\\").replace("'", "\\'")
        mq = (left + right).replace("\\", "\\\\").replace("'", "\\'")
        expr = (
            f"aggregate({expr}, CAST(array() AS array<string>), (acc, x) -> "
            f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{lq}' AND x = '{rq}' "
            f"THEN concat(slice(acc, 1, size(acc) - 1), array('{mq}')) "
            "ELSE concat(acc, array(x)) END)"
        )
    tokenized = toks.withColumn("bpe", F.expr(expr))
    return (
        tokenized.groupBy("doc_id")
        .agg(
            F.sum(F.size("bpe")).alias("n_bpe_tokens"),
            F.count(F.lit(1)).alias("n_words"),
        )
        .withColumn(
            "tokens_per_word", F.round(F.col("n_bpe_tokens") / F.col("n_words"), 6)
        )
    )


@query(
    "tfidf_cosine_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents),
    grams AS (
      SELECT doc_id,
             UNNEST(list_transform(range(1, len(t) - 1),
                                   i -> array_to_string(t[i:i+2], ' '))) AS sh
      FROM toks),
    tf AS (SELECT doc_id, sh, COUNT(*) AS tf FROM grams GROUP BY 1, 2),
    df AS (SELECT sh, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    w AS (
      SELECT tf.doc_id, tf.sh, tf.tf * LN(n.n_docs / df.df) AS w
      FROM tf JOIN df USING (sh) CROSS JOIN n),
    norms AS (SELECT doc_id, SQRT(SUM(w * w)) AS nrm FROM w GROUP BY 1),
    dots AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.w * b.w) AS dot
      FROM w a JOIN w b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT d.id_a, d.id_b,
           ROUND(d.dot / (na.nrm * nb.nrm), 6) AS cosine
    FROM dots d
    JOIN norms na ON na.doc_id = d.id_a
    JOIN norms nb ON nb.doc_id = d.id_b
    WHERE d.dot / (na.nrm * nb.nrm) >= 0.6
    """,
    category="llm",
)
def tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document similarity by TF-IDF-weighted cosine over 3-gram shingles
    (>= 0.6) — the weighted-set complement of the Jaccard kernel: Jaccard
    treats every shingle equally, TF-IDF downweights boilerplate shingles so
    two docs sharing only common phrases stop ranking as near-dups.

    Same scale geometry as the Jaccard path: intersections come from a
    posting equi-join on the shingle (selective because shingles are rare),
    never an all-pairs product; IDF weights are a small aggregate folded in
    via join; norms broadcast back. At 100 TB, high-df shingles (the
    non-selective join keys) would additionally be dropped before the
    self-join — the standard idf-floor pruning — which changes only the
    candidate count, not the formula."""
    d = table(spark, sf_dir, "documents")
    grams = shingle_posting(d, n=3)
    tf = grams.groupBy("doc_id", "sh").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.count()  # driver scalar, like the PageRank node count
    w = (
        tf.join(df_, "sh")
        .select(
            "doc_id",
            "sh",
            (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("w"),
        )
        .localCheckpoint(eager=False)  # feeds norms + both sides of the dot-product join
    )
    norms = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("id_a"), F.col("nrm").alias("nrm_a"))
    nb = norms.select(F.col("doc_id").alias("id_b"), F.col("nrm").alias("nrm_b"))
    return (
        dots.join(F.broadcast(na), "id_a")
        .join(F.broadcast(nb), "id_b")
        .withColumn("cosine", F.round(F.col("dot") / (F.col("nrm_a") * F.col("nrm_b")), 6))
        .filter(F.col("dot") / (F.col("nrm_a") * F.col("nrm_b")) >= 0.6)
        .select("id_a", "id_b", "cosine")
    )


@query(
    "zipf_token_slope",
    oracle="""
    WITH toks AS (
      SELECT UNNEST(string_split_regex(text, '\\s+')) AS tok FROM documents),
    vocab AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS freq FROM toks GROUP BY tok),
    ranked AS (
      SELECT tok, freq,
             ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rnk
      FROM vocab)
    SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
           ROUND(regr_slope(LN(freq), LN(rnk)), 6) AS zipf_slope,
           ROUND(regr_r2(LN(freq), LN(rnk)), 6) AS zipf_r2
    FROM ranked
    """,
    category="llm",
)
def zipf_token_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the token rank-frequency curve: the log-log
    regression slope (natural corpora sit near -1; synthetic or templated
    text deviates hard — this fixture's tiny uniform vocabulary reads
    shallow, which is exactly the signal) plus R². Token count -> vocab
    ranks -> regr_slope. The global frequency rank uses the two-pass
    distributed prefix rank (operators/prefixrank.py) — at corpus scale
    the VOCAB itself is data-proportional (billions of distinct n-grams),
    so an unpartitioned rank window would funnel it through one task
    (r6 rewrite; flagged by the tightened plan-smell detector)."""
    from db_core_spark.operators.prefixrank import global_row_number

    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.col("text"), r"\s+")).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("freq"))
    ranked, _n = global_row_number(
        vocab, [F.col("freq").desc(), F.col("tok")], out="rnk"
    )
    lf, lr = F.log("freq"), F.log("rnk")
    return ranked.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.round(F.regr_slope(lf, lr), 6).alias("zipf_slope"),
        F.round(F.regr_r2(lf, lr), 6).alias("zipf_r2"),
    )


@query(
    "vocab_oov_rate",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
      FROM documents),
    toks2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    vocab AS (
      SELECT term FROM (
        SELECT term, COUNT(*) AS freq FROM toks2 GROUP BY term
        ORDER BY freq DESC, term LIMIT 1000)),
    scored AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov
      FROM toks2 t LEFT JOIN vocab v ON v.term = t.term
      GROUP BY t.doc_id)
    SELECT doc_id, n_tokens, n_oov,
           ROUND(n_oov * 1.0 / n_tokens, 6) AS oov_rate
    FROM scored
    """,
    category="llm",
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage check: per-document out-of-vocabulary rate against
    the corpus top-1000 vocabulary — the pre-training gate that catches
    documents a fixed vocab would shred into unknowns (code, other
    scripts, boilerplate). The vocab is one term-frequency aggregate cut
    to 1000 rows by TakeOrderedAndProject and BROADCAST to the token
    stream; the per-doc rate is then a single hash aggregate — the corpus
    shuffles once (tokenize+count), never for the vocab probe. Vocab cut
    ties break (freq desc, term) identically on both engines."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("term")
    ).filter(F.col("term") != "")
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("term"))
        .limit(1000)
        .select("term", F.lit(True).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") * 1.0 / F.col("n_tokens"), 6).alias("oov_rate"),
        )
    )


# --- C4-style segment-level corpus dedup -----------------------------------
# Fixture docs are single-line, so the "line" unit of C4's famous dedup
# (Raffel et al. 2020, §2.2: "we discarded all but one of any three-sentence
# span occurring more than once") is re-expressed as fixed-width word
# segments. The shape is identical: explode the corpus into segments, pick
# ONE global winner per distinct segment (first occurrence in (doc_id,
# seg_idx) order), drop every other copy, reassemble the surviving text.

_SEG_CTE = """
    base AS (SELECT doc_id, source, str_split(text, ' ') AS ws FROM documents),
    segd AS (
      SELECT doc_id, source,
             unnest(range(0, CAST(ceil(len(ws) / {w}.0) AS BIGINT))) AS seg_idx,
             unnest(list_transform(
                 range(0, CAST(ceil(len(ws) / {w}.0) AS BIGINT)),
                 i -> array_to_string(ws[(i*{w}+1):(i*{w}+{w})], ' '))) AS seg
      FROM base)
"""


def _segments(d: DataFrame, width: int) -> DataFrame:
    """Explode documents into consecutive ``width``-word segments WITHOUT a
    shuffle: the segment array is built row-locally from ``split(text)``
    (sequence + slice + concat_ws), then posexploded. No groupBy is needed
    to form segments, so the only exchanges in the consuming operators are
    the ones their own semantics require."""
    ws = F.split(F.col("text"), " ")
    n_seg = (F.ceil(F.size(ws) / F.lit(float(width)))).cast("int")
    seg_arr = F.transform(
        F.sequence(F.lit(0), n_seg - F.lit(1)),
        lambda i: F.concat_ws(" ", F.slice(ws, i * width + 1, width)),
    )
    return d.select(
        "doc_id", "source", F.posexplode(seg_arr).alias("seg_idx", "seg")
    )


@query(
    "dedup_segments_global",
    oracle="WITH "
    + _SEG_CTE.format(w=5)
    + """,
    ranked AS (
      SELECT doc_id, seg_idx, seg,
             row_number() OVER (PARTITION BY md5(seg)
                                ORDER BY doc_id, seg_idx) AS rn
      FROM segd)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_seg,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN seg END, ' '
                                   ORDER BY seg_idx), '')) AS clean_md5
    FROM ranked
    GROUP BY doc_id
    """,
    category="llm",
)
def dedup_segments_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style global segment dedup: every distinct 5-word segment survives
    exactly once corpus-wide (first occurrence by (doc_id, seg_idx) wins);
    all other copies are cut and each document is reassembled from its
    surviving segments (per-doc kept/dropped counts + md5 of the cleaned
    text).

    100 TB shape: the winner-election window partitions by md5(seg) — a
    fixed 32-char key — so the exchange never keys on variable-length text,
    and segment formation itself is shuffle-free (row-local array ops).
    This is one corpus shuffle + one per-doc hash aggregate, the minimum
    any global cross-document dedup can do. At even larger scale the same
    plan holds with the window swapped for a groupBy(digest).min(pos) +
    co-partitioned self-join; semantics identical.

    Reference analog: db-core dedups at object granularity via key
    identity (/root/reference/src/system/instance.rs:191-210); this extends the
    idea to sub-document granularity, the C4/RefinedWeb curation step.
    """
    from pyspark.sql import Window as PW

    d = table(spark, sf_dir, "documents")
    segd = _segments(d, width=5)
    rn = F.row_number().over(
        PW.partitionBy(F.md5("seg")).orderBy("doc_id", "seg_idx")
    )
    ranked = segd.withColumn("rn", rn).withColumn(
        "kept_seg", F.when(F.col("rn") == 1, F.col("seg"))
    )
    kept_sorted = F.transform(
        F.filter(
            F.array_sort(F.collect_list(F.struct("seg_idx", "kept_seg"))),
            lambda s: s["kept_seg"].isNotNull(),
        ),
        lambda s: s["kept_seg"],
    )
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_seg"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.md5(F.concat_ws(" ", kept_sorted)).alias("clean_md5"),
    )


@query(
    "text_boilerplate_segments",
    oracle="WITH "
    + _SEG_CTE.format(w=3)
    + """
    SELECT source, seg,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM segd
    GROUP BY source, seg
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
    category="llm",
)
def text_boilerplate_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate mining: 3-word segments repeated across >= 2 distinct
    documents of the SAME source (the nav-bar / footer / license-header
    signature of a crawl source). The output is the removal list a cleanup
    pass would broadcast-anti-join against the corpus.

    100 TB shape: one hash aggregate keyed on (source, segment) with
    map-side partial counts-distinct folded into the same exchange; the
    result is tiny by construction (only repeated segments survive
    HAVING), which is exactly what makes the follow-up broadcast join
    cheap. Per-source grouping also mirrors how crawl corpora are laid
    out (partitioned by source), so in a partitioned deployment this
    aggregate runs partition-local."""
    d = table(spark, sf_dir, "documents")
    segd = _segments(d, width=3)
    return (
        segd.groupBy("source", "seg")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )


@query(
    "corpus_ngram_novelty",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents),
    segd AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(t) - 1),
                                          i -> array_to_string(t[i:i+2], ' ')))
               AS shs
      FROM toks),
    posting AS (SELECT doc_id, UNNEST(shs) AS sh FROM segd),
    firsts AS (SELECT sh, MIN(doc_id) AS first_doc FROM posting GROUP BY sh)
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           ROUND(SUM(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS novelty
    FROM posting p JOIN firsts f ON f.sh = p.sh
    GROUP BY p.doc_id
    """,
    category="llm",
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty curve: per document (in ingest order = doc_id), the
    fraction of its distinct word 3-grams never seen in ANY earlier
    document. This is the diminishing-returns signal crawl pipelines
    monitor — when marginal novelty flattens, more data from that source
    stops buying diversity — and the exact-dup documents in the fixture
    correctly read novelty 0.

    100 TB shape: one distinct (doc, shingle) posting pass (codegen
    window shingling, functions/text.py), a min-aggregate per shingle,
    and a join BACK on the shingle key that reuses the same hash
    partitioning (no extra exchange under AQE); the per-doc rollup is
    map-side combined. No all-pairs anything — novelty is first-occurrence
    bookkeeping, the same skeleton as the global segment dedup."""
    d = table(spark, sf_dir, "documents")
    posting = shingle_posting(d, n=3).distinct()
    firsts = posting.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    return (
        posting.join(firsts, "sh")
        .withColumn(
            "novel", (F.col("first_doc") == F.col("doc_id")).cast("int")
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("novel").cast("long").alias("n_novel"),
            F.round(F.sum("novel") / F.count(F.lit(1)), 6).alias("novelty"),
        )
    )


@query(
    "perplexity_bigram_lm",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(string_split_regex(text, '\\s+')) AS tok,
             generate_subscripts(string_split_regex(text, '\\s+'), 1) AS pos
      FROM documents),
    bigrams AS (
      SELECT a.doc_id, a.tok AS w1, b.tok AS w2
      FROM toks a JOIN toks b
        ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
    bg_counts AS (SELECT w1, w2, COUNT(*) AS c12 FROM bigrams GROUP BY 1, 2),
    ug_counts AS (SELECT w1, COUNT(*) AS c1 FROM bigrams GROUP BY 1),
    vsize AS (SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v FROM toks)
    SELECT bi.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(-LN((bg.c12 + 0.5) / (ug.c1 + 0.5 * vs.v))), 6)
             AS avg_neg_logp,
           ROUND(EXP(AVG(-LN((bg.c12 + 0.5) / (ug.c1 + 0.5 * vs.v)))), 4)
             AS perplexity
    FROM bigrams bi
    JOIN bg_counts bg ON bg.w1 = bi.w1 AND bg.w2 = bi.w2
    JOIN ug_counts ug ON ug.w1 = bi.w1
    CROSS JOIN vsize vs
    GROUP BY bi.doc_id
    """,
    category="llm",
)
def perplexity_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model perplexity with add-0.5 smoothing: every doc
    scored by mean -ln P(w2|w1) under the corpus's own bigram counts —
    one modeling step past perplexity_unigram_proxy and the closest
    SQL-expressible stand-in for the KenLM filter tier (CCNet): docs
    whose word ORDER is unusual now score high even when their unigram
    mix looks normal (shuffled text fools the unigram proxy, not this).

    100 TB shape: bigrams come from the codegen window shingler's shape
    (posexplode + lead, one doc-keyed exchange); the bigram/unigram count
    tables are the broadcast side (vocab² is bounded by observed pairs,
    not |V|²); the corpus-side scoring pass is map-only and the final
    per-doc average is the one wide shuffle."""
    from pyspark.sql import Window as PW

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), r"\s+")).alias("pos", "tok")
    )
    w = PW.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        toks.select(
            "doc_id", F.col("tok").alias("w1"), F.lead("tok").over(w).alias("w2")
        )
        .filter(F.col("w2").isNotNull())
    )
    bg = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ug = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vs = toks.agg(F.countDistinct("tok").cast("double").alias("v"))
    neg_logp = -F.log(
        (F.col("c12") + 0.5) / (F.col("c1") + 0.5 * F.col("v"))
    )
    scored = (
        bigrams.join(F.broadcast(bg), ["w1", "w2"])
        .join(F.broadcast(ug), "w1")
        .crossJoin(F.broadcast(vs))
        .withColumn("nlp", neg_logp)
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("nlp"), 6).alias("avg_neg_logp"),
        F.round(F.exp(F.avg("nlp")), 4).alias("perplexity"),
    )


@query(
    "corpus_lognormal_length_fit",
    oracle="""
    WITH lens AS (
      SELECT LN(CAST(n_chars AS DOUBLE)) AS x FROM documents WHERE n_chars > 0),
    fit AS (
      SELECT AVG(x) AS mu, stddev_pop(x) AS sigma,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lens),
    binned AS (
      SELECT CAST(floor((l.x - f.mu) / f.sigma * 2) AS BIGINT) AS z_bin,
             CAST(COUNT(*) AS BIGINT) AS obs, MAX(f.n) AS n
      FROM lens l CROSS JOIN fit f
      WHERE ABS(l.x - f.mu) < 3 * f.sigma
      GROUP BY 1)
    SELECT f.n AS n_docs,
           ROUND(f.mu, 6) AS mu_ln,
           ROUND(f.sigma, 6) AS sigma_ln,
           ROUND(EXP(f.mu + f.sigma * f.sigma / 2), 2) AS implied_mean_chars,
           CAST((SELECT COUNT(*) FROM binned) AS BIGINT) AS n_bins,
           (SELECT CAST(MAX(obs) AS BIGINT) FROM binned) AS modal_bin_count
    FROM fit f
    """,
    category="llm",
)
def corpus_lognormal_length_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-normal fit of the document-length distribution — the standard
    model for text lengths (and the basis for principled length cutoffs:
    filter at mu ± k·sigma in LOG space rather than arbitrary char
    counts). Reports the fitted (mu, sigma) of ln(length), the implied
    arithmetic mean exp(mu + sigma²/2) as a moment-consistency check, and
    half-sigma bin occupancy within ±3σ.

    100 TB shape: one moment aggregate over a row-local log transform,
    then a tiny binned pass against broadcast fit parameters."""
    d = table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    lens = d.select(F.log(F.col("n_chars").cast("double")).alias("x"))
    fit = lens.agg(
        F.avg("x").alias("mu"),
        F.stddev_pop("x").alias("sigma"),
        F.count(F.lit(1)).alias("n"),
    )
    binned = (
        lens.crossJoin(F.broadcast(fit))
        .filter(F.abs(F.col("x") - F.col("mu")) < 3 * F.col("sigma"))
        .groupBy(
            F.floor((F.col("x") - F.col("mu")) / F.col("sigma") * 2)
            .cast("long")
            .alias("z_bin")
        )
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    bstats = binned.agg(
        F.count(F.lit(1)).alias("n_bins"), F.max("obs").alias("modal_bin_count")
    )
    return fit.crossJoin(F.broadcast(bstats)).select(
        F.col("n").alias("n_docs"),
        F.round("mu", 6).alias("mu_ln"),
        F.round("sigma", 6).alias("sigma_ln"),
        F.round(F.exp(F.col("mu") + F.col("sigma") * F.col("sigma") / 2), 2).alias(
            "implied_mean_chars"
        ),
        F.col("n_bins").cast("long"),
        F.col("modal_bin_count").cast("long"),
    )


@query(
    "text_keywords_rake",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(string_split_regex(text, '\\s+')) AS tok,
             generate_subscripts(string_split_regex(text, '\\s+'), 1) AS pos
      FROM documents),
    flagged AS (
      SELECT doc_id, tok, pos,
             CASE WHEN tok IN ('the','a','of','and','to','in','is','it',
                               'that','for') THEN 1 ELSE 0 END AS is_stop
      FROM toks),
    runs AS (
      SELECT doc_id, tok, pos, is_stop,
             SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS run_id
      FROM flagged),
    phrases AS (
      SELECT doc_id, run_id,
             string_agg(tok, ' ' ORDER BY pos) AS phrase,
             CAST(COUNT(*) AS BIGINT) AS n_words
      FROM runs WHERE is_stop = 0
      GROUP BY doc_id, run_id
      HAVING COUNT(*) BETWEEN 2 AND 4),
    scored AS (
      SELECT phrase, n_words,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM phrases GROUP BY phrase, n_words),
    ranked AS (
      SELECT phrase, n_words, freq, n_docs,
             row_number() OVER (ORDER BY freq * n_words DESC, phrase) AS rk
      FROM scored)
    SELECT phrase, n_words, freq, n_docs, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 25
    """,
    category="llm",
)
def text_keywords_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE-style keyword extraction: candidate phrases are the maximal
    stopword-free token runs (2-4 words), scored by frequency x length —
    the unsupervised keyword/tag surface a corpus browser ships. The cute
    part is the segmentation: phrase boundaries are a CUMULATIVE SUM of
    the stopword flag (every stopword increments the run id; non-stop
    runs share one), i.e. sessionization transplanted from time gaps to
    token gaps — no UDF, no regex backtracking.

    100 TB shape: one doc-keyed window for run ids, one hash aggregate to
    assemble phrases, one to score them, TakeOrderedAndProject for the
    top-k."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), r"\s+")).alias("pos", "tok")
    )
    is_stop = F.when(F.col("tok").isin(*EN_STOPWORDS), 1).otherwise(0)
    w = W.partitionBy("doc_id").orderBy("pos").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    runs = toks.withColumn("is_stop", is_stop).withColumn(
        "run_id", F.sum("is_stop").over(w)
    )
    phrases = (
        runs.filter(F.col("is_stop") == 0)
        .groupBy("doc_id", "run_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
            ).alias("phrase"),
            F.count(F.lit(1)).alias("n_words"),
        )
        .filter(F.col("n_words").between(2, 4))
    )
    scored = phrases.groupBy("phrase", "n_words").agg(
        F.count(F.lit(1)).alias("freq"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    wr = W.orderBy((F.col("freq") * F.col("n_words")).desc(), "phrase")
    return (
        scored.withColumn("rk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rk") <= 25)
    )


@query(
    "corpus_heaps_law_fit",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split_regex(text, '\\s+')) AS tok
      FROM documents),
    firsts AS (SELECT tok, MIN(doc_id) AS first_doc FROM toks GROUP BY tok),
    per_doc AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_toks,
             CAST(SUM(CASE WHEN f.first_doc = t.doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_new_types
      FROM toks t JOIN firsts f ON f.tok = t.tok
      GROUP BY t.doc_id),
    cum AS (
      SELECT doc_id,
             SUM(n_toks) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW) AS cum_tokens,
             SUM(n_new_types) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED
                                    PRECEDING AND CURRENT ROW) AS vocab
      FROM per_doc)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(regr_slope(LN(CAST(vocab AS DOUBLE)),
                            LN(CAST(cum_tokens AS DOUBLE))), 6) AS heaps_beta,
           ROUND(EXP(regr_intercept(LN(CAST(vocab AS DOUBLE)),
                                    LN(CAST(cum_tokens AS DOUBLE)))), 4)
             AS heaps_k,
           ROUND(regr_r2(LN(CAST(vocab AS DOUBLE)),
                         LN(CAST(cum_tokens AS DOUBLE))), 6) AS r2,
           CAST(MAX(vocab) AS BIGINT) AS final_vocab,
           CAST(MAX(cum_tokens) AS BIGINT) AS final_tokens
    FROM cum
    """,
    category="llm",
)
def corpus_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V = K·N^β of vocabulary growth in ingest order:
    cumulative distinct types vs cumulative tokens, log-log regressed
    with the built-in bivariate aggregates — the growth exponent that
    predicts how much NEW vocabulary (hence tokenizer/embedding churn)
    the next 10x of crawl will bring (β near the fixture's small-vocab
    saturation reads low — the right answer, which the oracle pins;
    natural corpora sit near 0.5). Cumulative distinct uses the
    first-occurrence trick (corpus_ngram_novelty's kernel): count a type
    on its FIRST doc only, then a running sum — never a quadratic
    distinct-over-prefix. Both running sums (tokens, vocab) run as ONE
    two-pass distributed prefix sum over the per-doc frame
    (`operators/prefixrank.py::global_running_sums`) — no unpartitioned
    window anywhere; integer sums make the offset addition exact."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("tok")
    )
    firsts = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        toks.join(firsts, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_new_types"),
        )
    )
    from db_core_spark.operators.prefixrank import global_running_sums

    cum = global_running_sums(
        per_doc,
        [F.col("doc_id")],
        {"n_toks": "cum_tokens", "n_new_types": "vocab"},
    ).select("cum_tokens", "vocab")
    lv = F.log(F.col("vocab").cast("double"))
    ln = F.log(F.col("cum_tokens").cast("double"))
    return cum.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.regr_slope(lv, ln), 6).alias("heaps_beta"),
        F.round(F.exp(F.regr_intercept(lv, ln)), 4).alias("heaps_k"),
        F.round(F.regr_r2(lv, ln), 6).alias("r2"),
        F.max("vocab").cast("long").alias("final_vocab"),
        F.max("cum_tokens").cast("long").alias("final_tokens"),
    )


@query(
    "corpus_diversity_indices",
    oracle="""
    WITH mix AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2),
    tot AS (SELECT lang, SUM(n) AS t FROM mix GROUP BY 1)
    SELECT m.lang,
           CAST(COUNT(*) AS BIGINT) AS n_sources,
           ROUND(1.0 - SUM((m.n * 1.0 / t.t) * (m.n * 1.0 / t.t)), 6)
             AS simpson_diversity,
           ROUND(-SUM((m.n * 1.0 / t.t) * LN(m.n * 1.0 / t.t)), 6)
             AS shannon_entropy,
           ROUND(EXP(-SUM((m.n * 1.0 / t.t) * LN(m.n * 1.0 / t.t))), 4)
             AS effective_sources
    FROM mix m JOIN tot t ON t.lang = m.lang
    GROUP BY m.lang
    """,
    category="llm",
)
def corpus_diversity_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-diversity indices per language — Simpson (1-Σp², the
    probability two random docs come from different sources), Shannon
    entropy, and its exponential (EFFECTIVE source count, the number of
    equally-sized sources that would give the same diversity) — the
    ecology metrics a corpus curator reads before trusting a language
    slice ('12 sources' can be 1.3 effective sources). Two chained tiny
    aggregates over the (lang, source) mix."""
    d = table(spark, sf_dir, "documents")
    mix = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    tot = mix.groupBy("lang").agg(F.sum("n").alias("t"))
    p = F.col("n") / F.col("t")
    return (
        mix.join(tot, "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sources"),
            F.round(1.0 - F.sum(p * p), 6).alias("simpson_diversity"),
            F.round(-F.sum(p * F.log(p)), 6).alias("shannon_entropy"),
            F.round(F.exp(-F.sum(p * F.log(p))), 4).alias("effective_sources"),
        )
    )


@query(
    "pipeline_curation_report",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, text,
             string_split_regex(text, '\\s+') AS t
      FROM documents),
    quality AS (
      SELECT doc_id, source, text, len(t) AS n_toks,
             CASE WHEN len(t) BETWEEN 20 AND 1000
                   AND len(list_filter(t, x -> list_contains(
                       ['the','a','of','and','to','in','is','it','that','for'],
                       x))) * 1.0 / len(t) > 0.02
                  THEN 1 ELSE 0 END AS q_ok
      FROM toks),
    deduped AS (
      SELECT doc_id, source, n_toks, q_ok,
             row_number() OVER (PARTITION BY md5(text)
                                ORDER BY doc_id) AS rn
      FROM quality),
    kept AS (
      SELECT source, n_toks FROM deduped WHERE q_ok = 1 AND rn = 1),
    per_src AS (
      SELECT d.source,
             CAST(COUNT(*) AS BIGINT) AS n_raw,
             CAST(SUM(CASE WHEN d.q_ok = 1 AND d.rn = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_kept,
             CAST(SUM(CASE WHEN d.q_ok = 1 AND d.rn = 1 THEN d.n_toks
                           ELSE 0 END) AS BIGINT) AS kept_tokens
      FROM deduped d GROUP BY d.source),
    tot AS (
      SELECT SUM(kept_tokens) AS t, SUM(sqrt(kept_tokens)) AS ts
      FROM per_src)
    SELECT p.source, p.n_raw, p.n_kept, p.kept_tokens,
           ROUND(p.n_kept * 100.0 / p.n_raw, 4) AS keep_rate_pct,
           ROUND(p.kept_tokens / t.t, 6) AS raw_share,
           ROUND(sqrt(p.kept_tokens) / t.ts, 6) AS temp_share
    FROM per_src p CROSS JOIN tot t
    """,
    category="llm",
)
def pipeline_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE curation pipeline in one declarative plan: quality gate
    (length band + stopword floor) -> exact dedup (first doc per content
    digest) -> per-source keep rates and surviving token counts -> the
    T=2 temperature mix over the KEPT corpus — raw crawl to training-mix
    weights in a single Catalyst-optimized query, the capstone composing
    text_quality_score, dedup_exact_keep, and corpus_mix_temperature.

    100 TB shape: quality flags are row-local; the dedup window keys on
    the 16-byte digest; everything after is per-source rollup against
    a broadcast totals row. ONE corpus scan, two bounded exchanges —
    the whole pipeline's cost model in one EXPLAIN."""
    from pyspark.sql import Window as PW

    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    q_ok = (
        F.size(toks).between(20, 1000) & (n_stop / F.size(toks) > 0.02)
    ).cast("int")
    w = PW.partitionBy("dg").orderBy("doc_id")
    deduped = (
        d.select(
            "doc_id", "source", F.md5("text").alias("dg"),
            F.size(toks).alias("n_toks"), q_ok.alias("q_ok"),
        )
        .withColumn("rn", F.row_number().over(w))
    )
    keep = (F.col("q_ok") == 1) & (F.col("rn") == 1)
    per_src = deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(keep, F.col("n_toks")).otherwise(0))
        .cast("long")
        .alias("kept_tokens"),
    )
    tot = per_src.agg(
        F.sum("kept_tokens").alias("t"),
        F.sum(F.sqrt("kept_tokens")).alias("ts"),
    )
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_raw",
        "n_kept",
        "kept_tokens",
        F.round(F.col("n_kept") * 100.0 / F.col("n_raw"), 4).alias(
            "keep_rate_pct"
        ),
        F.round(F.col("kept_tokens") / F.col("t"), 6).alias("raw_share"),
        F.round(F.sqrt("kept_tokens") / F.col("ts"), 6).alias("temp_share"),
    )


@query(
    "corpus_length_percentile_cutoffs",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(quantile_cont(n_chars, 0.01), 2) AS p01_chars,
           ROUND(quantile_cont(n_chars, 0.99), 2) AS p99_chars,
           CAST(SUM(CASE WHEN n_chars < (SELECT quantile_cont(n_chars, 0.01)
                                         FROM documents) THEN 1 ELSE 0 END)
                AS BIGINT) AS below_global_p01
    FROM documents
    GROUP BY lang
    """,
    category="llm",
)
def corpus_length_percentile_cutoffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length-cutoff table: the p01/p99 character bounds a
    truncation-and-floor filter would apply PER LANGUAGE, plus how many
    of each language's docs fall under the GLOBAL p01 — the check that
    catches a global cutoff silently deleting a short-form language
    (CJK-style) that a per-language cutoff would keep. Exact percentiles
    per group (language groups span the whole corpus — at 100 TB this is
    the value-buffer hazard; operators/quantile.bucketed_exact_quantiles
    keeps it exact with bounded state, as agg_percentiles demonstrates);
    the global bound is a broadcast scalar subquery."""
    d = table(spark, sf_dir, "documents")
    g01 = d.agg(F.percentile("n_chars", F.lit(0.01)).alias("g"))
    return (
        d.crossJoin(F.broadcast(g01))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.percentile("n_chars", F.lit(0.01)), 2).alias("p01_chars"),
            F.round(F.percentile("n_chars", F.lit(0.99)), 2).alias("p99_chars"),
            F.sum(F.when(F.col("n_chars") < F.col("g"), 1).otherwise(0))
            .cast("long")
            .alias("below_global_p01"),
        )
    )
