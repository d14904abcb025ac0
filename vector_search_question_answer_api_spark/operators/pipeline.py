"""Training-data pipeline operators beyond the reference surface: PII
scrubbing, deterministic dataset splits, greedy sequence packing, and
train/test contamination measurement (SURVEY.md §2 extension families).

All four are standard large-corpus preparation steps.  Three are pure
Catalyst expressions; sequence packing is the one genuinely stateful
per-shard fold and uses the repo's applyInPandas seam with a recursive-CTE
DuckDB oracle (same precedent as dup_clusters).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# PII scrubbing.  Patterns are deliberately RE2-compatible (no backrefs, no
# lookaround) so Spark's Java regex and DuckDB's RE2 produce identical
# matches; replacement order matters (emails before bare IPs, URLs before
# phone digit runs) and is part of the contract.

PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d -]{7,}\d", "<PHONE>"),
]


def scrub_pii(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, scrubbed, n_email, n_url, n_ip, n_phone): redact PII spans
    and count replacements per class.

    Map-only over the corpus (regexp_replace chains stay inside whole-stage
    codegen); at 100 TB this is a pure scan-projection pass with no shuffle.
    """
    out = documents.select(
        "doc_id", F.coalesce(F.col(text_col), F.lit("")).alias("_t")
    )
    for name, pat, token in PII_PATTERNS:
        # Count on the CURRENT text (post earlier replacements — the
        # documented order contract), then redact.
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col("_t"), F.lit(pat), 0)),
        ).withColumn("_t", F.regexp_replace(F.col("_t"), pat, token))
    return out.select(
        "doc_id",
        F.col("_t").alias("scrubbed"),
        *[F.col(f"n_{name}") for name, _, _ in PII_PATTERNS],
    )


# ---------------------------------------------------------------------------
# Deterministic dataset split.  Hash-mod assignment is THE scale-safe split:
# stable under reshuffling/appends, needs no global sort or count, and any
# engine can reproduce it (md5 leading word mod 100).

def dataset_split(
    documents: DataFrame,
    train_pct: int = 80,
    valid_pct: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bucket, split): bucket = md5(doc_id) leading 32 bits mod
    100; split = train/valid/test by cumulative percentage."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + valid_pct, "valid")
        .otherwise("test")
    )
    return documents.select(
        F.col(id_col).alias("doc_id"),
        bucket.alias("bucket"),
        split.alias("split"),
    )


# ---------------------------------------------------------------------------
# Greedy sequence packing (LLM pretraining batch prep): walk each shard's
# docs in deterministic order, close a bin when the next doc would overflow
# ``capacity`` tokens.  Inherently a sequential fold per shard — the 100 TB
# pattern is "pack within each shard in parallel", which is exactly one
# applyInPandas group per shard; no cross-shard state exists.

def pack_sequences(
    doc_tokens: DataFrame, capacity: int = 256, shard_mod: int | None = None
) -> DataFrame:
    """Input: (source, doc_id, n_tokens).  Output: (source, doc_id, bin_id,
    bin_fill) where bin_id numbers bins per source from 0 in doc_id order
    and bin_fill is the running token total within the bin.

    Docs with n_tokens > capacity get a bin of their own (standard
    oversize rule).  Arrow-batched fold: one pandas group per source.

    ``shard_mod`` bounds group size at scale: a single source can be
    terabytes, and one pandas group per source would pin it to one task.
    With shard_mod=N the fold runs per (source, pmod(doc_id, N)) and bin
    ids are disambiguated by shard (bin_id = local_bin * N + shard).
    Packing is then greedy WITHIN each sub-shard — bins never span
    sub-shards, which is the usual contract anyway (an output shard is
    written by one worker).  Default None keeps the exact single-walk
    semantics the oracle replays.

    Sharding uses ``F.pmod`` on the Spark side to match Python's
    non-negative ``%`` in the bin-id encoding — Spark's ``%`` keeps the
    dividend's sign, so a plain ``%`` group key would collide shards for
    negative doc_ids (ADVICE r2 low)."""
    schema = "source string, doc_id long, bin_id long, bin_fill long"
    mod = shard_mod or 1

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        shard = int(pdf["doc_id"].iloc[0]) % mod if mod > 1 else 0
        bins, fills = [], []
        bin_id, fill = 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill > 0 and fill + n > capacity:
                bin_id += 1
                fill = 0
            fill += n
            bins.append(bin_id * mod + shard)
            fills.append(fill)
        return pd.DataFrame(
            {
                "source": pdf["source"],
                "doc_id": pdf["doc_id"],
                "bin_id": bins,
                "bin_fill": fills,
            }
        )

    base = doc_tokens.select("source", "doc_id", "n_tokens")
    if shard_mod:
        return base.withColumn(
            "_shard", F.pmod(F.col("doc_id"), F.lit(shard_mod))
        ).groupBy("source", "_shard").applyInPandas(
            lambda pdf: _pack(pdf.drop(columns=["_shard"])), schema
        )
    return base.groupBy("source").applyInPandas(_pack, schema)


# ---------------------------------------------------------------------------
# Train/test contamination: for each held-out doc, the fraction of its
# distinct k-shingles that appear anywhere in the training corpus.  The
# inverted-index semi-join shape (ids only in the shuffle) is the same
# scale-safe recipe as the dedup tiers — never an all-pairs comparison.

def contamination_scores(
    documents: DataFrame, test_mod: int = 17, k: int = 3
) -> DataFrame:
    """(doc_id, n_shingles, n_hit, contamination): doc_id % test_mod == 0
    marks the held-out set; contamination = hit fraction of its distinct
    shingles against the train-side distinct shingle inventory."""
    from vector_search_question_answer_api_spark.operators.dedup import shingle_sets

    sets = shingle_sets(documents, k)
    is_test = (F.col("doc_id") % test_mod) == 0
    test = sets.filter(is_test)
    train_shingles = (
        sets.filter(~is_test)
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )
    test_inv = test.select(
        "doc_id", F.size("shingles").alias("n_shingles"), F.explode("shingles").alias("shingle")
    )
    hits = (
        test_inv.join(train_shingles, "shingle")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count("*").alias("n_hit"))
    )
    base = test.select("doc_id", F.size("shingles").alias("n_shingles"))
    return (
        base.join(hits, ["doc_id", "n_shingles"], "left")
        .withColumn("n_hit", F.coalesce(F.col("n_hit"), F.lit(0)))
        .withColumn(
            "contamination",
            F.when(
                F.col("n_shingles") > 0,
                F.round(F.col("n_hit") / F.col("n_shingles").cast("double"), 6)
                + F.lit(0.0),
            ).otherwise(F.lit(0.0)),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic exact stratified sampling: exactly min(n, |stratum|) rows
# per stratum, chosen by a hash ordering so the sample is reproducible and
# engine-independent.  `df.sampleBy` gives only EXPECTED counts (Bernoulli
# per row); training-data curation usually wants exact per-stratum quotas.

def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Exactly ``min(n_per_stratum, stratum size)`` rows per stratum.

    Rows rank within their stratum by ``md5(salt || id)`` (id tiebreak),
    so the choice is uniform-ish, deterministic, and reproducible from
    the ``salt`` — change the salt to draw an independent sample.  One
    window shuffle on the strata key; no driver participation.  At 100 TB
    heavy strata sort within their partitions only (rank-k cutoff is a
    WindowGroupLimit, which pushes the k-filter into the sort).
    """
    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
        F.col(id_col),
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# Domain-mixture sampling: build a training mix with EXACT per-domain
# quotas apportioned from target weights (the "data mixing" step of corpus
# construction — e.g. 30% web / 20% code / ... of a fixed token budget).
# Quota arithmetic is pure driver-side math over the weights dict (no data
# touched); row selection reuses the stratified-sample hash-rank recipe, so
# the draw is deterministic, reproducible from the salt, and exact.

def mixture_quotas(weights: dict[str, float], total_n: int) -> dict[str, int]:
    """Largest-remainder (Hamilton) apportionment of ``total_n`` slots
    across domains by normalized weight.  Deterministic: remainder ties
    break by domain name.  Exposed separately so an oracle can embed the
    same constants."""
    if total_n < 0:
        raise ValueError("total_n must be >= 0")
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-empty and non-negative")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to > 0")
    raw = {d: total_n * w / wsum for d, w in weights.items()}
    base = {d: int(raw[d]) for d in weights}
    leftover = total_n - sum(base.values())
    for d in sorted(raw, key=lambda d: (-(raw[d] - base[d]), d))[:leftover]:
        base[d] += 1
    return base


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    total_n: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Exact-quota mixture sample: at most ``quota[d]`` rows per domain
    ``d`` (fewer only when the domain is smaller than its quota), rows
    chosen by the deterministic ``md5(salt || id)`` rank within the domain.

    One window shuffle on the domain key (WindowGroupLimit prunes each
    input partition to its local top-quota before the exchange); the quota
    table is a literal CASE expression — nothing broadcast, no driver data
    motion.  Emits ``mix_rank`` (1-based rank within the domain draw) so a
    downstream consumer can take a prefix to shrink the mix consistently.
    """
    quotas = {
        d: q for d, q in mixture_quotas(weights, total_n).items() if q > 0
    }
    # zero-quota domains (legitimately produced by tiny weights) are
    # excluded from the scan filter entirely — otherwise their full row
    # sets would be hashed and shuffled only for the CASE to drop them
    if not quotas:
        return (
            df.filter(F.lit(False))
            .withColumn("mix_rank", F.lit(0))
            .select(*df.columns, "mix_rank")
        )
    quota_expr = F.lit(0)
    for d, q in sorted(quotas.items()):
        quota_expr = F.when(F.col(domain_col) == d, q).otherwise(quota_expr)
    w = Window.partitionBy(domain_col).orderBy(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
        F.col(id_col),
    )
    # The constant max-quota bound is what lets Spark infer a
    # WindowGroupLimit (the rule needs a literal rank limit — a CASE
    # expression alone defeats it): every partition's sort is pruned to
    # the largest quota, then the per-domain CASE trims to exact quotas.
    max_quota = max(quotas.values())
    return (
        df.filter(F.col(domain_col).isin(*quotas.keys()))
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") <= F.lit(max_quota)) & (F.col("_rn") <= quota_expr))
        .withColumnRenamed("_rn", "mix_rank")
    )


def token_budget_sample(
    df: DataFrame,
    domain_col: str,
    token_col: str,
    budgets: dict[str, int],
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Greedy per-domain TOKEN-budget sample — the unit that matters when
    assembling a training mix is tokens, not documents (domain token
    budgets are how published mixes are specified; doc-count quotas
    over-weight domains with long documents).

    Per domain: rank documents by the same deterministic ``md5(salt ||
    id)`` draw as :func:`mixture_sample`, then keep documents while the
    RUNNING TOKEN TOTAL (exclusive of the current document) is still under
    the domain's budget — so the document that crosses the line is
    included and every domain reaches at least its budget (when it has
    the tokens) while overshooting by at most one document.  Emits
    ``mix_rank`` and ``cum_tokens`` (running total INCLUDING the row) so a
    consumer can trim or audit the draw.

    One window shuffle on the domain key — rank and running sum share the
    single ``(domain, md5-rank)`` sort; domains without a budget are
    excluded at the scan like zero-quota mixture domains.  Deterministic:
    same inputs, same salt → same sample on any cluster layout."""
    budgets = {d: int(b) for d, b in budgets.items() if int(b) > 0}
    if not budgets:
        return (
            df.filter(F.lit(False))
            .withColumn("mix_rank", F.lit(0))
            .withColumn("cum_tokens", F.lit(0).cast("long"))
            .select(*df.columns, "mix_rank", "cum_tokens")
        )
    budget_expr = F.lit(0)
    for d, b in sorted(budgets.items()):
        budget_expr = F.when(F.col(domain_col) == d, b).otherwise(budget_expr)
    w = Window.partitionBy(domain_col).orderBy(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
        F.col(id_col),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.filter(F.col(domain_col).isin(*budgets.keys()))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_cum", F.sum(F.col(token_col).cast("long")).over(run)
        )
        .filter(F.col("_cum") - F.col(token_col) < budget_expr)
        .withColumnRenamed("_rn", "mix_rank")
        .withColumnRenamed("_cum", "cum_tokens")
    )


# ---------------------------------------------------------------------------
# Corpus filter funnel: the per-stage retention report every large-scale
# cleaning pipeline publishes (C4/Gopher-style "N docs in, N out per rule").
# One scan computes every stage flag, one window marks exact-dedup
# survivors, one aggregation folds the cumulative counts — the report is
# O(stages) rows regardless of corpus size.

FUNNEL_STAGES = ["all", "lang", "length", "quality", "dedup"]


def filter_funnel(
    documents: DataFrame,
    lang: str = "en",
    min_tokens: int = 40,
    min_quality: float = 0.88,
) -> DataFrame:
    """(stage, stage_name, n_docs, retained_frac): cumulative survivor
    counts through declared-lang -> min-token-length -> quality-score ->
    exact-dedup stages.  ``retained_frac`` is vs the full corpus (stage 0).

    The quality score is ``text_analysis.quality_components`` — the one
    shared definition — so the funnel's keep/drop decisions can never
    drift from the published quality_score.  The dedup stage marks
    survivors WITHIN the set that passed the earlier stages (partitioning
    the survivor window on the pass flag), matching what a real pipeline
    does: if a duplicate group's lowest-id member was already dropped by
    an earlier rule, the surviving member still represents its group.
    """
    from vector_search_question_answer_api_spark.functions import text as TXT
    from vector_search_question_answer_api_spark.operators.text_analysis import (
        _toks,
        quality_components,
    )

    proc = TXT.preprocess_text(F.col("text"))
    toks = _toks(proc)
    q = quality_components(toks)
    # round(score, 6) BEFORE the threshold compare, mirrored in the oracle
    # SQL: the comparison then never sits on an unrounded float boundary,
    # so both engines make identical keep/drop decisions.
    score = F.round(q["score"], 6)
    flagged = documents.select(
        "doc_id",
        (F.col("lang") == lang).alias("b_lang"),
        (q["n"] >= min_tokens).alias("b_len"),
        (score >= min_quality).alias("b_q"),
        F.md5(proc).alias("fp"),
    ).withColumn("b_pass", F.col("b_lang") & F.col("b_len") & F.col("b_q"))
    surv_w = Window.partitionBy("fp", "b_pass").orderBy("doc_id")
    flagged = flagged.withColumn(
        "b_surv", F.row_number().over(surv_w) == 1
    )
    c = lambda cond: F.sum(cond.cast("long"))  # noqa: E731
    agg = flagged.agg(
        F.count("*").alias("n0"),
        c(F.col("b_lang")).alias("n1"),
        c(F.col("b_lang") & F.col("b_len")).alias("n2"),
        c(F.col("b_pass")).alias("n3"),
        c(F.col("b_pass") & F.col("b_surv")).alias("n4"),
    )
    stages = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage"),
                F.lit(name).alias("stage_name"),
                F.col(f"n{i}").alias("n_docs"),
            )
            for i, name in enumerate(FUNNEL_STAGES)
        ]
    )
    return (
        agg.select(F.col("n0"), F.explode(stages).alias("s"))
        .select(
            F.col("s.stage").alias("stage"),
            F.col("s.stage_name").alias("stage_name"),
            F.col("s.n_docs").alias("n_docs"),
            (
                F.round(
                    F.when(
                        F.col("n0") > 0,
                        F.col("s.n_docs").cast("double") / F.col("n0"),
                    ).otherwise(0.0),
                    6,
                )
                + F.lit(0.0)
            ).alias("retained_frac"),
        )
        .orderBy("stage")
    )
