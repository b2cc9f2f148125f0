"""Corpus-curation operators for LLM training-data pipelines.

* Benchmark decontamination — flag training documents that share any
  word n-gram (default n=13, the published GPT-3/PaLM decontamination
  window) with an evaluation/benchmark set, so eval data can be
  removed from the training corpus before training.
* Deterministic stratified sampling — per-stratum keep rates applied
  through a salted md5 hash of the document id, so the sample is
  reproducible across runs, executors, and engines (no RNG state).

Scale notes (the 100 TB shapes):

* ``decontaminate``: a benchmark set is small by definition (10^3-10^6
  eval documents vs 10^9+ training docs), so its distinct-gram set is
  BROADCAST — the training corpus is scanned once, its grams are
  pipelined row amplification off the scan (posexplode, never a
  shuffle), and only matching (doc, gram) hits enter the per-doc count
  aggregation.  Total shuffle cost is proportional to contamination
  hits, not corpus size.
* ``stratified_sample``: a pure narrow filter — no shuffle, no window,
  no driver-side state; md5 is computed JVM-side per row and the rate
  table is a literal map.  Partition pruning and predicate pushdown
  still apply upstream because the filter composes with the scan.

The reference has no corpus-curation stage (it corrects a fixed novel
set, e.g. memoocr/pipeline.py); these operators extend the engine with
the curation steps a web-scale training pipeline needs, as SURVEY.md §6
prescribes, alongside the dedup family in ``operators/dedup.py``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def word_ngram_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """(id, gram) rows — the DISTINCT word ``n``-grams of the
    whitespace-tokenized, lowercased text.  All JVM-side: split +
    transform over an index sequence + explode; docs shorter than ``n``
    tokens produce no rows (the ``size >= n`` guard also keeps
    ``sequence(1, size-n+1)`` ascending — Spark's ``sequence(1, 0)``
    DESCENDS and would emit bogus indexes)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    base = df.select(F.col(id_col).alias("id"), toks.alias("ts")).where(
        F.size("ts") >= n
    )
    return base.select(
        "id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, size(ts) - {n - 1}),"
                    f" i -> concat_ws(' ', slice(ts, i, {n})))"
                )
            )
        ).alias("gram"),
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per training document: (id, n_hits, contaminated) where
    ``n_hits`` counts the document's distinct word ``n``-grams that
    also occur anywhere in the benchmark set, and ``contaminated`` is
    the 0/1 verdict (int, not boolean, for cross-engine hash parity).

    Every training document appears in the output exactly once — docs
    with no grams (shorter than ``n`` tokens) report 0 hits rather
    than vanishing, so downstream anti-joins can use the verdict
    column directly.

    The gram join is deliberately UNHINTED (r5 — the same treatment as
    ``strip_boilerplate_lines``'s hot-line join): the "bench is small"
    premise usually holds, but a 10^6-doc eval suite × 10²-10³ distinct
    13-grams per doc approaches the 8 GB broadcast ceiling, and a
    forced hint there would kill the job.  AQE broadcasts the gram set
    when it measures small and falls back to a shuffle join on the gram
    key when it doesn't — the no-assumptions plan at both scales
    (tests pin the AQE choice for a small and an oversized bench)."""
    # the overlap test needs only gram IDENTITY, so both sides join on
    # xxhash64(gram) — 8-byte keys instead of ~100-char 13-gram strings
    # through the broadcast/shuffle and the hash probes (r7, guide
    # §2.3; hit counts unchanged absent a 64-bit collision — the
    # dedup-module hash-is-identity premise)
    bench_grams = (
        word_ngram_table(bench, id_col, text_col, n)
        .select(F.xxhash64("gram").alias("gram"))
        .distinct()
    )
    hits = (
        word_ngram_table(train, id_col, text_col, n)
        .select("id", F.xxhash64("gram").alias("gram"))
        .join(bench_grams, "gram")
        .groupBy("id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        train.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_hits", F.lit(0).cast("bigint")).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).cast("int").alias(
                "contaminated"
            ),
        )
    )


def _md5_mod(id_col, salt: str, mod: int) -> F.Column:
    """Deterministic 0..mod-1 value: first 32 bits of md5('salt:id')
    mod ``mod``.  md5 (not xxhash64) so the DuckDB oracle can recompute
    the identical value from the same hex digits; the string cast makes
    it id-type-agnostic (string conv_ids hash the same way bigint
    doc_ids do).  Built on the ONE shared first-32-bits-of-md5 core
    (sketches._md5_u32) — the recipe is engine-portability-critical and
    must not fork (code-review r5 s5)."""
    from memo_fraktur_ocr_code_spark.operators.sketches import _md5_u32

    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return _md5_u32(F.concat(F.lit(f"{salt}:"), c.cast("string"))) % mod


def sample_bucket(id_col, salt: str = "strat") -> F.Column:
    """Deterministic 0..9999 sampling bucket (see :func:`_md5_mod`)."""
    return _md5_mod(id_col, salt, 10000).alias("bucket")


def stratified_sample(
    df: DataFrame,
    rates_bp: dict[str, int],
    default_bp: int = 0,
    id_col: str = "doc_id",
    strata_col: str = "lang",
    salt: str = "strat",
) -> DataFrame:
    """Keep each row iff its deterministic bucket falls below the
    stratum's rate in basis points (``rates_bp['en'] = 2500`` keeps
    ~25% of the 'en' stratum); strata absent from the map use
    ``default_bp``.  Output: (id, stratum, bucket) of the kept rows —
    the bucket column is the reproducibility evidence (same input →
    byte-identical sample on any engine)."""
    pairs: list[F.Column] = []
    for k, v in sorted(rates_bp.items()):
        pairs += [F.lit(k), F.lit(int(v))]
    rate = (
        F.coalesce(
            F.create_map(*pairs)[F.col(strata_col)], F.lit(int(default_bp))
        )
        if pairs
        else F.lit(int(default_bp))
    )
    return (
        df.select(
            F.col(id_col),
            F.col(strata_col),
            sample_bucket(id_col, salt),
            rate.alias("_rate_bp"),
        )
        .where(F.col("bucket") < F.col("_rate_bp"))
        .drop("_rate_bp")
    )


def split_assign(
    df: DataFrame,
    weights_bp: dict[str, int] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split assignment: every row gains a
    ``split`` label chosen by where its md5 bucket falls in the
    cumulative weight ranges (basis points, must sum to 10000; default
    9000/500/500 train/val/test).

    Same engine-portable bucket as :func:`stratified_sample`, so the
    assignment is reproducible across runs, engines, and corpus
    *growth*: a document's split never changes when other documents are
    added or removed — the property that keeps eval sets stable while a
    crawl corpus is continuously extended.  Pure narrow projection, no
    shuffle."""
    weights = (
        {"train": 9000, "val": 500, "test": 500}
        if weights_bp is None
        else weights_bp
    )
    total = sum(weights.values())
    assert total == 10000, f"weights_bp must sum to 10000, got {total}"
    bucket = _md5_mod(id_col, salt, 10000)
    expr = None
    acc = 0
    # deterministic range order: sorted by name so the mapping is a
    # function of the weights alone, not dict insertion order
    for name in sorted(weights):
        acc += weights[name]
        cond = bucket < acc
        expr = (
            F.when(cond, name) if expr is None else expr.when(cond, name)
        )
    return df.select(
        F.col(id_col), bucket.alias("bucket"), expr.alias("split")
    )


def pack_token_budget(
    df: DataFrame,
    budget: int,
    n_shards: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign documents to fixed-token-budget packs for training-shard
    assembly: (id, shard, n_tokens, pack_id).

    Documents are first hashed into ``n_shards`` independent shards
    (``id % n_shards``), then walked in id order WITHIN each shard with
    a running token total; ``pack_id`` is the quota bin the document's
    cumulative total lands in (a document may straddle a quota
    boundary — this is quota packing, not first-fit bin packing, which
    is inherently sequential and would not distribute).

    Scale shape: the only window is PARTITIONED by shard — each shard's
    running sum is an independent task, so the operator parallelizes to
    ``n_shards`` regardless of corpus size.  An unpartitioned
    running-sum (the naive formulation) would funnel the whole corpus
    through one task and is exactly the plan shape the repo's plan
    guards reject."""
    toks = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    )
    # md5-hash the id into its shard rather than pmod on the raw column:
    # pmod over a non-numeric id (string conv_ids are the corpus
    # convention) silently yields NULL and funnels the whole corpus into
    # one shard/one window task (ADVICE r3); the md5 route is
    # id-type-agnostic and oracle-portable
    base = df.select(
        F.col(id_col).alias("id"),
        _md5_mod(id_col, "shard", n_shards).cast("int").alias("shard"),
        toks.cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.select(
        F.col("id").alias(id_col),
        "shard",
        "n_tokens",
        F.sum("n_tokens").over(w).alias("_cum"),
    ).select(
        id_col,
        "shard",
        "n_tokens",
        F.expr(
            f"CAST(greatest(_cum - 1, 0) DIV {int(budget)} AS BIGINT)"
        ).alias("pack_id"),
    )


#: Alternation-free, lookaround-free PII patterns — the subset on which
#: Java regex (Spark) and RE2 (DuckDB) agree byte-for-byte.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+[0-9]{1,3}[ -][0-9]{2,4}[ -][0-9]{2,8}", "<PHONE>"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def redact_pii(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Replace PII-shaped substrings (emails, international phone
    numbers, IPv4 addresses) with typed placeholder tokens:
    (id, redacted, n_redactions).

    A pure narrow projection — ``regexp_replace`` chains JVM-side with
    no shuffle, so redaction composes with the scan at any corpus size.
    ``n_redactions`` counts the pattern MATCHES stage by stage
    (``regexp_count`` before each replacement) — never by re-finding
    the placeholder in the output, so pre-existing placeholder-shaped
    text is not miscounted and custom tags containing regex
    metacharacters are safe.  Replacement tags are escaped against
    Java's ``$``/``\\`` group-reference syntax."""
    pats = PII_PATTERNS if patterns is None else patterns
    red = F.col(text_col)
    n = F.lit(0)
    for pat, tag in pats:
        n = n + F.regexp_count(red, F.lit(pat))
        safe_tag = tag.replace("\\", "\\\\").replace("$", "\\$")
        red = F.regexp_replace(red, pat, safe_tag)
    return df.select(
        F.col(id_col),
        red.alias("redacted"),
        n.cast("int").alias("n_redactions"),
    )


def domain_mix_weights(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    target_shares_ppm: dict[str, int] | None = None,
) -> DataFrame:
    """Per-domain sampling weights that rebalance the corpus token mix
    to a target share — the domain-mixing step of a training-data
    pipeline (e.g. up-weight books, down-weight crawl).

    Default target: uniform across the observed domains
    (``1e6 DIV n_domains`` ppm each); pass ``target_shares_ppm`` to pin
    explicit shares.  Outputs per domain: document count, token count
    (whitespace tokens, same counter as textstats.token_counts), the
    actual token share in ppm, and ``weight_bp`` — the sampling
    multiplier in basis points (``target_tokens * 1e4 DIV
    domain_tokens``), so ``sum(domain_tokens * weight_bp / 1e4)``
    re-hits the target mix.  Integer arithmetic end to end (exact,
    associative, engine-portable).

    Domains observed in the corpus but absent from an explicit
    ``target_shares_ppm`` get ``weight_bp = 0`` — excluded from the
    target mix by definition, never a silent NULL.

    Scale: one aggregation by domain (shuffle of |domains| groups after
    map-side combine) + a broadcast single-row totals join — nothing
    scales with corpus rows except the scan."""
    from memo_fraktur_ocr_code_spark.operators.textstats import (
        _ws_tokens,
    )

    # the docstring's "same counter as textstats.token_counts" is a
    # shared function, not a promise — a tokenizer tweak cannot
    # desynchronize this count from the other token metrics
    toks = F.size(_ws_tokens(text_col))
    per_dom = (
        df.select(F.col(domain_col).alias("domain"), toks.alias("nt"))
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
        )
    )
    totals = per_dom.agg(
        F.sum("n_tokens").alias("tot_tokens"),
        F.count("*").alias("n_domains"),
    )
    joined = per_dom.crossJoin(F.broadcast(totals))
    if target_shares_ppm is None:
        target_ppm = F.expr("1000000 DIV n_domains")
    else:
        mapping = F.create_map(
            *[
                F.lit(x)
                for kv in target_shares_ppm.items()
                for x in kv
            ]
        )
        # coalesce: a domain missing from the explicit target map is
        # excluded (weight 0), not NULL'd out of the result
        target_ppm = F.coalesce(
            mapping[F.col("domain")], F.lit(0)
        )
    # weight spec in SMALL-integer arithmetic: share quantized to ppm
    # first, then weight_bp = target_ppm * 1e4 DIV share_ppm — the
    # intermediate never exceeds 1e10 (no overflow at any corpus size,
    # where target_ppm * tot_tokens would blow past 2^63 at ~10^13
    # tokens), no doubles ever touch the value (Spark's double->bigint
    # cast truncates while DuckDB's rounds), and DuckDB mirrors the
    # exact sequence.  greatest(...,1) guards sub-ppm domains.
    return (
        joined.withColumn("target_ppm", target_ppm.cast("bigint"))
        .withColumn(
            "share_ppm", F.expr("n_tokens * 1000000 DIV tot_tokens")
        )
        .select(
            "domain",
            "n_docs",
            "n_tokens",
            "share_ppm",
            F.expr(
                "target_ppm * 10000 DIV greatest(share_ppm, 1)"
            ).alias("weight_bp"),
        )
    )


def strip_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_line_df: int = 3,
    min_line_chars: int = 10,
) -> DataFrame:
    """CCNet-style line-level boilerplate removal: drop every line whose
    normalized form appears in more than ``max_line_df`` documents
    (navigation chrome, cookie banners, footers — content that repeats
    across pages is boilerplate by definition), keep everything else in
    original order and casing.

    Lines shorter than ``min_line_chars`` after normalization are exempt
    from the frequency test (short lines collide by chance — 'Home',
    '1', '***' — and dropping them would mangle lists); they are always
    kept.  Normalization for the frequency key = lowercase + whitespace
    collapse, the same equivalence the dedup family uses.  Output:
    ``(id, text, n_kept, n_dropped)`` with ``text`` rebuilt by joining
    the surviving lines with newline.

    Scale: one line-frequency aggregation (map-side combine absorbs the
    skew: boilerplate is by definition the head of the distribution) +
    one join of the exploded line table against the hot-line set, then a
    per-doc ordered re-assembly via ``collect_list`` over a posexploded
    index — no window over the corpus and nothing driver-side.  The
    hot-line join is left UNHINTED: at a low ``max_line_df`` over a
    web-scale corpus the hot set is the head AND torso of a Zipf
    distribution (potentially billions of keys), so forcing a broadcast
    would blow the 8 GB limit — AQE broadcasts it when it measures
    small and shuffle-joins otherwise.  The normalization key is the
    dedup family's own ``normalize_text_col`` (shared function, not a
    copy).

    NULL ``text`` is treated as the empty document (coalesced to ``''``
    before the split): the row survives with ``clean_text=''``,
    ``n_kept=1`` (the one empty line), ``n_dropped=0`` — keep-everything
    means every input id appears in the output, so a NULL-text document
    must not vanish at stage 1 of a funnel (posexplode over a NULL array
    yields zero rows, which would drop the doc uncounted).
    """
    from memo_fraktur_ocr_code_spark.operators.dedup import (
        normalize_text_col,
    )

    norm = normalize_text_col
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("line_no", "line"),
    ).withColumn("key", norm(F.col("line")))
    eligible = F.length("key") >= min_line_chars
    hot = (
        lines.where(eligible)
        .select("id", "key")
        .distinct()  # df = documents containing the line, not copies
        .groupBy("key")
        .agg(F.count("*").alias("line_df"))
        .where(F.col("line_df") > max_line_df)
        .select("key")
    )
    kept = lines.join(
        hot.withColumn("_hot", F.lit(1)), "key", "left"
    ).withColumn(
        "drop", eligible & F.col("_hot").isNotNull()
    )
    out = (
        kept.groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("drop"),
                                F.struct("line_no", "line"),
                            )
                        )
                    ),
                    lambda st: st["line"],
                ),
                "\n",
            ).alias("clean_text"),
            F.sum(F.when(~F.col("drop"), 1).otherwise(0)).alias(
                "n_kept"
            ),
            F.sum(F.when(F.col("drop"), 1).otherwise(0)).alias(
                "n_dropped"
            ),
        )
        .select(
            F.col("id").alias(id_col), "clean_text", "n_kept", "n_dropped"
        )
    )
    return out


def chunk_sliding_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Overlapping sliding-window token chunks — the RAG/context-window
    chunker (fixed-size windows with an overlap so no span is split
    across a boundary without also appearing whole in a neighbor),
    complementing W4's non-overlapping 250-token chunking
    (textspec.with_chunk_key).

    One row per chunk, ``(id, chunk_idx, start_tok, n_tok,
    chunk_text)``:

    * window starts step by ``stride = chunk_tokens - overlap``;
    * a start ``s > 0`` is emitted only while ``s + overlap < n_tok``:
      a window whose tokens are ALL inside the previous one (the tail
      fully covered by overlap) is suppressed, so the last chunk is
      the first one reaching the document's end;
    * tokens are the whitespace-split non-empty words; documents with
      zero tokens (empty/NULL text) emit no rows — exploded child
      table like `extraction.extract_links`.

    Scale shape: one generate + project per document, no shuffle; the
    output size is the token count times ``chunk_tokens/stride`` (the
    overlap amplification, stated — e.g. 128/96 ≈ 1.33×), and the
    chunk id ``(id, chunk_idx)`` is stable under re-partitioning, so
    downstream embedding/dedup stages can key on it.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    n = F.size(toks)
    # sequence(0, -1) DESCENDS in Spark — guard the empty-doc case
    # before building the start grid
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride)))
    starts = F.filter(
        starts,
        lambda s: (s == 0) | (s + F.lit(int(overlap)) < n),
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start_tok"),
            F.slice(toks, s + 1, F.lit(int(chunk_tokens))).alias("w"),
        ),
    )
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(chunks).alias("chunk_idx", "_c"),
    )
    return exploded.select(
        "id",
        "chunk_idx",
        F.col("_c.start_tok").alias("start_tok"),
        F.size("_c.w").alias("n_tok"),
        F.array_join("_c.w", " ").alias("chunk_text"),
    )


def quantile_cuts(
    df: DataFrame,
    score_col: str,
    fracs_bp: list[int],
    max_bins: int = 1_000_001,
) -> list[int]:
    """EXACT rank quantile cut values over an integer score column —
    the percentile-thresholding primitive behind "keep the top X% by
    quality score" filters and CCNet's perplexity head/middle/tail
    bucketing (Wenzek et al. 2020, arXiv:1911.00359 §4.3).

    For each fraction ``f`` (basis points, ascending, 0 < f ≤ 10000)
    the cut is the score of the rank-``ceil(f·N/10000)`` document when
    the corpus is sorted by score DESCENDING — equivalently
    ``max{s : count(score ≥ s) ≥ r}``.  Ties share the cut score, so a
    ``score ≥ cut`` filter keeps AT LEAST the requested fraction and
    never splits equal-scored documents arbitrarily.  Integer-exact:
    no interpolation, no doubles — two engines (or two partitionings)
    always compute identical cuts.

    Scale shape: this is NOT a global sort (``percent_rank`` over the
    corpus would single-partition 100 TB).  The corpus-sized work is
    ONE histogram aggregation ``groupBy(score).count()`` with map-side
    combine, whose output is bounded by the score DOMAIN, not the
    corpus: quality signals in this repo are quantized integers by
    design (bp ≤ 10001 distinct, ppm ≤ 1000001).  The driver then
    walks the collected histogram — a bounded driver action of the
    same class as the whale router's whale pick and the k-means
    codebook.  ``max_bins`` enforces the premise: a column wider than
    the budget raises instead of silently flooding the driver
    (pre-quantize, e.g. ``ppm DIV 100``, and rerun).

    Returns the cut list parallel to ``fracs_bp`` (non-increasing).
    """
    if not fracs_bp or any(
        not (0 < f <= 10000) for f in fracs_bp
    ) or list(fracs_bp) != sorted(set(fracs_bp)):
        raise ValueError(
            "fracs_bp must be strictly ascending basis points in (0, 10000]"
        )
    dtype = dict(df.dtypes).get(score_col)
    if dtype not in ("int", "bigint", "smallint", "tinyint"):
        raise TypeError(
            f"quantile_cuts needs an integer score column, got {dtype};"
            " quantize (bp/ppm) first"
        )
    hist = (
        df.groupBy(F.col(score_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("c"))
        .limit(max_bins + 1)
        .collect()
    )
    if not hist:
        raise ValueError("quantile_cuts: empty input")
    if len(hist) > max_bins:
        raise ValueError(
            f"quantile_cuts: > {max_bins} distinct scores — quantize the"
            " column before thresholding"
        )
    if any(r["s"] is None for r in hist):
        raise ValueError("quantile_cuts: NULL scores present")
    total = sum(r["c"] for r in hist)
    cuts: list[int] = []
    by_score_desc = sorted(hist, key=lambda r: -r["s"])
    for f in fracs_bp:
        rank = (f * total + 9999) // 10000
        cum = 0
        cut = by_score_desc[-1]["s"]
        for r in by_score_desc:
            cum += r["c"]
            if cum >= rank:
                cut = r["s"]
                break
        cuts.append(int(cut))
    return cuts


def assign_quantile_buckets(
    df: DataFrame,
    score_col: str,
    cuts: list[int],
    labels: list[str] | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Label every row with its quantile bucket given :func:`quantile_cuts`
    output: bucket ``i`` is ``score ≥ cuts[i]`` (first match wins, so a
    boundary tie lands in the HIGHER bucket), the final label is the
    remainder.  ``len(labels) == len(cuts) + 1``.  Narrow CASE
    projection — zero shuffle at any corpus size; heavy ties can leave
    an interior bucket empty (two equal cuts), which is the
    deterministic outcome, not an error."""
    if labels is None:
        labels = [f"q{i}" for i in range(len(cuts) + 1)]
    if len(labels) != len(cuts) + 1:
        raise ValueError("need len(cuts) + 1 labels")
    if list(cuts) != sorted(cuts, reverse=True):
        raise ValueError("cuts must be non-increasing (from quantile_cuts)")
    expr = F.lit(labels[-1])
    for cut, label in reversed(list(zip(cuts, labels[:-1]))):
        expr = F.when(
            F.col(score_col) >= F.lit(int(cut)), F.lit(label)
        ).otherwise(expr)
    return df.withColumn(bucket_col, expr)


def normalize_unicode(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    form: str = "NFC",
) -> DataFrame:
    """Unicode normalization of a text column — the canonicalization
    step that makes every downstream exact/near-dup signature, token
    count, and dictionary join insensitive to encoding-level variants
    (``e`` + combining acute vs precomposed ``é``, U+212B ANGSTROM SIGN
    vs ``Å``): two byte-different spellings of the same text otherwise
    hash to different dedup signatures and split word frequencies.

    Returns ``(id, norm_text, changed)`` with ``changed`` as a 0/1 int
    (engine-portable hashing) and NULL text passed through as NULL.

    Engine contract: the normalization tables are the published Unicode
    ones, so Python's ``unicodedata`` (this side) and DuckDB's
    ``nfc_normalize`` (the oracle) are INDEPENDENT implementations of
    the same spec — a genuine cross-engine check, unlike oracles that
    re-derive with the same library.  ``form`` accepts all four Unicode
    forms; only NFC has a DuckDB twin, the others are covered by unit
    tests.

    Scale shape: one Arrow-batched projection, zero shuffle — the
    legitimate Pandas-UDF case, since Catalyst has no normalization
    expression and the tables are far too large to encode as literals.
    """
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown Unicode normalization form {form!r}")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(col: pd.Series) -> pd.Series:
        import unicodedata

        return col.map(
            lambda t: None
            if t is None
            else unicodedata.normalize(form, t)
        )

    staged = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("_raw"),
        _norm(F.col(text_col)).alias("norm_text"),
    )
    return staged.select(
        "id",
        "norm_text",
        F.when(F.col("norm_text").eqNullSafe(F.col("_raw")), 0)
        .otherwise(1)
        .alias("changed"),
    )


def hashed_ngram_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    salt: str = "dsir",
) -> DataFrame:
    """``(id, bucket)`` rows — one per unigram AND bigram OCCURRENCE of
    the whitespace-tokenized lowercased text, hashed into a FIXED
    number of buckets (first 32 bits of ``md5('salt:gram')`` mod
    ``n_buckets``) — the hashed bag-of-ngrams featurization of DSIR
    (Xie et al., NeurIPS 2023, §3: unigrams+bigrams hashed to 10^4
    buckets).  md5 (not xxhash64) so the DuckDB oracle recomputes the
    identical bucket from the same hex digits (:func:`_md5_mod`).

    Scale shape: pure scan-side row amplification (split + explode +
    one JVM md5 per occurrence), never a shuffle of its own; the whole
    point of hashing is that every downstream aggregate is bounded at
    ``n_buckets`` rows no matter the corpus size."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    base = df.select(F.col(id_col).alias("id"), toks.alias("ts"))
    uni = base.select("id", F.explode("ts").alias("g"))
    bi = base.where(F.size("ts") >= 2).select(
        "id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ts) - 1),"
                " i -> concat(ts[i-1], ' ', ts[i]))"
            )
        ).alias("g"),
    )
    return uni.unionByName(bi).select(
        "id", _md5_mod(F.col("g"), salt, n_buckets).alias("bucket")
    )


def dsir_importance(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR-style importance signal for data selection (Xie et al.,
    NeurIPS 2023, "Data Selection for Language Models via Importance
    Resampling"): score every raw-corpus document by how much more
    typical its hashed-ngram features are of the TARGET distribution
    than of the RAW distribution.  Both distributions are bucket
    multinomials with add-one smoothing estimated from occurrence
    counts; the per-document score is the feature inner product

        ``dsir_ppm = sum over feature occurrences of
                     (ppm_target[bucket] - ppm_raw[bucket])``

    with ``ppm = (count + 1) * 1e6 DIV (total + n_buckets)``.  Integer
    ppm DIFFERENCES stand in for the paper's log-probability ratios
    (same monotone per-feature direction, same sum-over-occurrences
    aggregation): log/exp differ across libm implementations in the
    last ulp while integer ratio+sum is associative and
    engine-portable bit for bit — the precedent set by
    ``textstats.bigram_lm_score``.  Deviation is documented, not
    hidden: rankings agree with the log formulation when bucket
    probabilities are within a small dynamic range, and diverge when a
    single rare bucket dominates (log amplifies rare-bucket evidence).

    Output: ``(id_col, n_feats, dsir_ppm)`` for EVERY raw document
    (docs with no tokens score 0 with ``n_feats = 0`` — kept, typed
    bigint on both engines).

    Scale shape (the 100 TB story): two occurrence-count aggregations
    whose key space is CAPPED at ``n_buckets`` (map-side combine
    absorbs essentially everything — the reduce side moves at most
    ``n_buckets`` rows per side); the per-bucket score table is at most
    ``n_buckets`` rows BY CONSTRUCTION, so broadcasting it is forced
    safely (unlike ``decontaminate``'s bench-gram set, whose size is
    data-dependent and stays unhinted); the per-doc score is one
    groupBy over the feature stream.  Nothing anywhere scales worse
    than linearly in corpus size, and no state exceeds ``n_buckets``
    rows."""
    from memo_fraktur_ocr_code_spark.operators.dedup import (
        _register_cache,
    )

    # fr feeds two consumers (the raw bucket counts and the per-doc
    # score join) — uncached, the md5-per-occurrence featurization ran
    # twice over the corpus (r7).  The cache holds (id, bucket) pairs —
    # evictable, released by release_operator_caches; at corpus scale
    # the alternative is simply paying the second scan.
    fr = _register_cache(
        hashed_ngram_features(raw, id_col, text_col, n_buckets, salt)
    )
    ft = hashed_ngram_features(target, id_col, text_col, n_buckets, salt)
    # bucket-count tables are ≤ n_buckets rows but each feeds two
    # consumers (the score table and its own total) — cache both (r7)
    cr = _register_cache(
        fr.groupBy("bucket").agg(F.count("*").alias("cr"))
    )
    ct = _register_cache(
        ft.groupBy("bucket").agg(F.count("*").alias("ct"))
    )
    nr = cr.agg(
        F.coalesce(F.sum("cr"), F.lit(0)).cast("bigint").alias("nr")
    )
    nt = ct.agg(
        F.coalesce(F.sum("ct"), F.lit(0)).cast("bigint").alias("nt")
    )
    tbl = (
        cr.join(ct, "bucket", "left")
        .crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(nt))
        .select(
            "bucket",
            (
                F.expr(
                    "(coalesce(ct, CAST(0 AS BIGINT)) + 1) * 1000000"
                    f" DIV (nt + {n_buckets})"
                )
                - F.expr(f"(cr + 1) * 1000000 DIV (nr + {n_buckets})")
            ).alias("dppm"),
        )
    )
    per_doc = (
        fr.join(F.broadcast(tbl), "bucket")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_feats"),
            F.sum("dppm").alias("dsir_ppm"),
        )
    )
    return (
        raw.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_feats", F.lit(0).cast("bigint")).alias(
                "n_feats"
            ),
            F.coalesce("dsir_ppm", F.lit(0).cast("bigint")).alias(
                "dsir_ppm"
            ),
        )
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    keep_n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    salt: str = "dsir",
) -> DataFrame:
    """The selection half of DSIR: keep the ``keep_n`` raw documents
    with the highest importance signal.  Deterministic top-k under the
    total order ``(dsir_ppm DESC, id ASC)`` — a reproducibility
    deviation from the paper's Gumbel-noised resampling (Xie et al.
    2023 §3 samples WITHOUT replacement via perturbed weights); noised
    selection cannot be byte-reproduced across engines, and the
    deterministic top-k is the limit of their scheme as the noise
    scale goes to 0.

    Scale: Spark plans ``orderBy(...).limit(k)`` as TakeOrdered — a
    per-partition top-k then a single k-row merge on the driver, never
    a global sort."""
    scored = dsir_importance(
        raw, target, id_col, text_col, n_buckets, salt
    )
    return scored.orderBy(
        F.col("dsir_ppm").desc(), F.col(id_col).asc()
    ).limit(int(keep_n))


def temperature_mix_weights(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    alpha_quarters: int = 2,
) -> DataFrame:
    """Temperature-scaled multinomial domain sampling (Lample & Conneau
    2019 §3.1; XLM-R, Conneau et al. 2020 §3): sample domains with
    ``q_d ∝ p_d^alpha`` where ``p_d`` is the domain's token share —
    ``alpha < 1`` flattens the mix toward low-resource domains without
    the hard pinning of an explicit target table
    (:func:`domain_mix_weights` is the pinned-shares sibling).

    Engine-portability design: ``alpha`` is restricted to quarters
    (``alpha_quarters``/4 ∈ {1/4, 1/2, 3/4, 1}) because ``p^alpha``
    is then a chain of IEEE-754 ``sqrt`` and multiply — BOTH correctly
    rounded, so Spark and DuckDB produce bit-identical doubles — while
    ``pow``/``exp``/``log`` differ across libm implementations in the
    last ulp.  The normalizing sum over domains is folded IN DOMAIN
    ORDER on both engines (array_sort + aggregate here, list_sort +
    list_reduce there): float addition is non-associative, so an
    unordered SQL ``sum()`` over the domain table would be
    partitioning-dependent.  Output shares are rounded to integer ppm.

    Output per domain: ``(domain, n_docs, n_tokens, share_ppm,
    temp_ppm)`` — raw token share and temperature-scaled sampling share
    (both ppm; ``temp_ppm`` sums to ~1e6 up to rounding).

    Scale: one domain-keyed aggregation (map-side combine; |domains|
    groups) + one single-row broadcast of the sorted fold — nothing
    scales with corpus rows except the scan."""
    if alpha_quarters not in (1, 2, 3, 4):
        raise ValueError("alpha_quarters must be 1..4 (alpha = k/4)")
    from memo_fraktur_ocr_code_spark.operators.textstats import (
        _ws_tokens,
    )

    toks = F.size(_ws_tokens(text_col))
    per_dom = (
        df.select(F.col(domain_col).alias("domain"), toks.alias("nt"))
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
        )
    )
    totals = per_dom.agg(F.sum("n_tokens").alias("tot_tokens"))
    p = F.col("n_tokens").cast("double") / F.col("tot_tokens").cast(
        "double"
    )

    def _palpha(x):
        # x^(k/4) via sqrt chains: k=1 → sqrt(sqrt(x)), k=2 → sqrt(x),
        # k=3 → sqrt(x)*sqrt(sqrt(x)), k=4 → x
        r2 = F.sqrt(x)
        r4 = F.sqrt(r2)
        return {1: r4, 2: r2, 3: r2 * r4, 4: x}[alpha_quarters]

    scored = per_dom.crossJoin(F.broadcast(totals)).withColumn(
        "palpha", _palpha(p)
    )
    # normalizer folded in domain order — deterministic float sum
    norm = scored.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("domain", "palpha"))),
            F.lit(0.0),
            lambda acc, s: acc + s["palpha"],
        ).alias("tot_alpha")
    )
    return (
        scored.crossJoin(F.broadcast(norm))
        .select(
            "domain",
            "n_docs",
            "n_tokens",
            F.expr("n_tokens * 1000000 DIV tot_tokens").alias(
                "share_ppm"
            ),
            F.round(F.lit(1000000.0) * F.col("palpha") / F.col("tot_alpha"))
            .cast("bigint")
            .alias("temp_ppm"),
        )
    )


def sample_to_temperature(
    df: DataFrame,
    id_col: str = "doc_id",
    domain_col: str = "source",
    text_col: str = "text",
    alpha_quarters: int = 2,
    salt: str = "temp",
) -> DataFrame:
    """Apply :func:`temperature_mix_weights` to the corpus itself:
    down-sample every OVER-represented domain to the temperature-scaled
    share, deterministically per document (md5 bucket, the
    :func:`stratified_sample` mechanism — reproducible across runs,
    engines, and partitionings; no RNG state).

    Per-domain keep rate in basis points:
    ``rate_bp = min(temp_ppm * 1e4 DIV share_ppm, 1e4)`` — the ratio of
    the temperature share to the raw share, capped at 1 (a sampling
    pass cannot UP-sample; domains the temperature would up-weight keep
    everything and the relative mix is achieved by the others shrinking
    — the standard one-pass behavior; epoch-level up-sampling is a
    repetition decision, not a filter).

    Output: keep-everything — ``(id_col, domain, bucket, rate_bp,
    keep)`` so the verdict is auditable per document.

    Scale: the weights table is |domains| rows joined back broadcast
    (bounded by construction); the per-doc work is one md5 and one
    compare — a narrow projection off the scan."""
    w = temperature_mix_weights(
        df, domain_col=domain_col, text_col=text_col,
        alpha_quarters=alpha_quarters,
    ).select(
        "domain",
        F.least(
            F.expr(
                "temp_ppm * 10000 DIV greatest(share_ppm, CAST(1 AS"
                " BIGINT))"
            ),
            F.lit(10000).cast("bigint"),
        ).alias("rate_bp"),
    )
    # NULL-safe join: NULL domains form a weight group of their own in
    # temperature_mix_weights (groupBy keeps the NULL group), so the
    # keep-everything contract must carry them through here too — a
    # plain equi-join would silently drop every NULL-domain row
    # (ADVICE r5).  eqNullSafe keeps the broadcast hash join shape.
    left = df.select(
        F.col(id_col),
        F.col(domain_col).alias("domain"),
        _md5_mod(id_col, salt, 10000).alias("bucket"),
    )
    wj = w.withColumnRenamed("domain", "_w_domain")
    return (
        left.join(
            F.broadcast(wj), left["domain"].eqNullSafe(wj["_w_domain"])
        )
        .select(
            id_col,
            "domain",
            "bucket",
            "rate_bp",
            (F.col("bucket") < F.col("rate_bp")).cast("int").alias(
                "keep"
            ),
        )
    )


def expand_epochs(
    df: DataFrame,
    weights: DataFrame | None = None,
    id_col: str = "doc_id",
    domain_col: str = "source",
    text_col: str = "text",
    alpha_quarters: int = 2,
    salt: str = "epoch",
    max_epochs: int = 100,
) -> DataFrame:
    """Epoch-level repetition — the UP-sampling half
    :func:`sample_to_temperature` deliberately does not do (its
    docstring: "epoch-level up-sampling is a repetition decision, not a
    filter").  Materializes the temperature mix by replication: every
    document gets ``epochs_bp = temp_ppm * 1e4 DIV share_ppm`` basis
    points of epochs — ``epochs_bp DIV 1e4`` full copies plus one extra
    copy iff its md5 bucket falls under the fractional part.  A domain
    at 2.5 epochs ships 2 copies of every doc and a third copy of a
    deterministic half of them; an over-represented domain
    (epochs_bp < 1e4) degenerates to the sampling filter.  This is the
    standard LLM mixing recipe (rare domains repeated across epochs,
    e.g. Llama's Wikipedia/Books passes).

    Output: one row per (document, epoch) with ``n_copies`` and
    ``epoch`` (1-based) attached — downstream shuffling/packing treats
    each copy as a document.

    Scale: the weights table is |domains| rows, broadcast by
    construction; per-doc work is one md5 + one compare; the replication
    itself is a map-side explode (rows out = tokens budgeted, which is
    the POINT — the expansion is the product, not overhead).
    ``max_epochs`` (default 100) bounds the blow-up: a near-zero-share
    domain has ``share_ppm`` floored to 1, which would otherwise grant
    up to ``temp_ppm`` copies per document — and each row's epoch
    sequence materializes as ONE in-memory array before the explode,
    so an unbounded factor is an executor-OOM vector, not just output
    volume (code-review r5 s5; real mixing recipes stay under ~10).
    """
    if weights is None:
        weights = temperature_mix_weights(
            df,
            domain_col=domain_col,
            text_col=text_col,
            alpha_quarters=alpha_quarters,
        )
    w = weights.select(
        "domain",
        F.expr(
            f"least(temp_ppm * 10000 DIV greatest(share_ppm, 1),"
            f" {int(max_epochs) * 10000})"
        ).alias("epochs_bp"),
    )
    # drop w's join column BY REFERENCE: .drop("domain") would drop
    # every column of that name, stripping the caller's own domain
    # column when domain_col == "domain" (code-review r5 s5).
    # eqNullSafe, not ==: NULL domains carry a weight group of their
    # own out of temperature_mix_weights and must keep their epoch
    # budget rather than silently vanish at the join (ADVICE r5).
    j = df.join(
        F.broadcast(w), df[domain_col].eqNullSafe(w["domain"])
    ).drop(w["domain"])
    bucket = _md5_mod(id_col, salt, 10000)
    out = j.withColumn(
        "n_copies",
        F.expr("epochs_bp DIV 10000")
        + (bucket < F.expr("epochs_bp % 10000")).cast("long"),
    )
    # sequence(1, 0) would COUNT DOWN ([1, 0]) — guard the n_copies=0
    # case with an explicit empty array so those docs drop cleanly
    return out.withColumn(
        "epoch",
        F.explode(
            F.when(
                F.col("n_copies") >= 1,
                F.sequence(F.lit(1).cast("long"), F.col("n_copies")),
            ).otherwise(F.expr("CAST(array() AS array<bigint>)"))
        ),
    )


def unimax_budgets(
    df: DataFrame,
    budget_tokens: int,
    max_epochs: int = 4,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """UniMax budget allocation (Chung et al., "UniMax: Fairer and More
    Effective Language Sampling for Large-Scale Multilingual
    Pretraining", ICLR 2023): distribute a total training-token budget
    across domains so every domain gets an EQUAL share unless its
    epoch cap binds — the published alternative to temperature
    sampling (:func:`temperature_mix_weights`) that provably never
    repeats a low-resource domain past ``max_epochs`` passes.

    Algorithm (the paper's, integer-exact): visit domains in ASCENDING
    token-count order (ties by domain name — a total order); each
    domain receives ``min(n_tokens * max_epochs,
    remaining_budget DIV remaining_domains)``; subtract and continue.
    Small domains either take their full cap (freeing budget for the
    rest) or the fair share, so the final mix is "equal shares, capped
    by data".  All arithmetic is integer token counts (DIV) — the
    oracle replays it bit-for-bit as a recursive CTE.

    Output per domain: ``(domain, n_tokens, cap_tokens, alloc_tokens,
    epochs_bp)`` where ``epochs_bp = alloc * 10000 DIV n_tokens``
    (basis points of one epoch; 10000 = exactly one pass).

    Scale: ONE domain-keyed aggregation over the corpus (map-side
    combine, |domains| groups); the allocation walk itself is
    driver-side over the collected |domains|-row table — bounded
    metadata, the same pattern as ``quantile_cuts``'s bin walk, never
    corpus-sized.  NULL domains form their own group (keep-everything,
    like the temperature family)."""
    from memo_fraktur_ocr_code_spark.operators.textstats import (
        _ws_tokens,
    )

    if budget_tokens < 0 or max_epochs < 1:
        raise ValueError("budget_tokens >= 0 and max_epochs >= 1")
    spark = df.sparkSession
    toks = F.size(_ws_tokens(text_col))
    per = (
        df.select(F.col(domain_col).alias("domain"), toks.alias("nt"))
        .groupBy("domain")
        .agg(F.sum("nt").cast("long").alias("n_tokens"))
        .collect()
    )
    # TOTAL-order visit key (ADVICE r6): `domain or ''` alone maps a
    # NULL domain and an empty-string domain to the same key, so an
    # equal-n_tokens tie between them ordered nondeterministically
    # (collect order is partition-dependent).  NULL sorts before ''
    # explicitly; the oracle's ORDER BY coalesce(domain, '') leaves
    # that corner tie engine-arbitrary, but no fixture carries NULL
    # and '' domains at equal token counts — Spark is now at least
    # deterministic across partitionings.
    rows = sorted(
        per,
        key=lambda r: (
            r["n_tokens"],
            r["domain"] is not None,
            r["domain"] or "",
        ),
    )
    remaining = int(budget_tokens)
    out = []
    for i, r in enumerate(rows):
        n = int(r["n_tokens"])
        cap = n * int(max_epochs)
        fair = remaining // (len(rows) - i)
        alloc = min(cap, fair)
        remaining -= alloc
        out.append(
            (
                r["domain"],
                n,
                cap,
                alloc,
                (alloc * 10000) // n if n > 0 else 0,
            )
        )
    return spark.createDataFrame(
        out,
        "domain string, n_tokens long, cap_tokens long,"
        " alloc_tokens long, epochs_bp long",
    ).orderBy("domain")
