"""Transcript-payload operators: conversation-level transforms over the
BASELINE input-hint schema ``(conv_id, turn_idx, role, text, tool, ts)``.

The correction pipeline (plans/pipeline.py) consumes transcripts turn by
turn; the operators here are the conversation-level curation layer a
training-data pipeline needs AROUND that per-turn work: flattening a
conversation into one training document under a chat template, validating
the role sequence before a conversation is admitted to a training mix,
removing canned boilerplate turns that repeat across conversations,
summarizing tool usage, and mining (context, target) SFT pairs.

Stable turn ordering is the north rule's contract: every operator here
orders turns by ``(turn_idx, ts)`` — and where a total order is needed
for engine-portable determinism, by the full ``(turn_idx, ts, role,
text)`` struct — so any partitioning and any engine produce identical
output.

Scale shape: everything is either a single ``groupBy(conv_id)``
aggregation over sorted-struct arrays (one conversation-keyed shuffle,
the same key the flagship pipeline and the bucketed layout already use —
over ``bucket(conv_id)`` tables these aggregations are shuffle-free) or
a conversation-partitioned window with a bounded frame.  Per-conversation
state is bounded by conversation length; the whale-routing treatment in
plans/pipeline.py applies unchanged if a degenerate conversation
dominates a partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "render_conversation",
    "validate_turn_sequence",
    "flag_boilerplate_turns",
    "tool_call_stats",
    "sft_context_windows",
    "split_sessions",
    "conversation_prefix_groups",
    "truncate_to_token_budget",
]

# the stable per-conversation sort key: (turn_idx, ts) per the north
# rule, extended by (role, text) so the struct comparison is a TOTAL
# order even on pathological inputs that duplicate (turn_idx, ts)
_SORT_FIELDS = ("turn_idx", "ts", "role", "text")


def _sorted_turns(df: DataFrame, extra: tuple[str, ...] = ()) -> "F.Column":
    """collect_list of the turn structs followed by array_sort — struct
    comparison is field-by-field in declaration order, so the array is
    sorted by exactly ``(turn_idx, ts, role, text)``.  array_sort of the
    collected list replaces a window + collect over ordered rows: ONE
    aggregation, no window state, and the result is independent of the
    arrival order of rows into the aggregation buffer."""
    cols = [F.col(c) for c in _SORT_FIELDS] + [F.col(c) for c in extra]
    return F.array_sort(F.collect_list(F.struct(*cols)))


def render_conversation(
    df: DataFrame,
    role_open: str = "<|",
    role_close: str = "|>",
    turn_sep: str = "\n",
) -> DataFrame:
    """Flatten each conversation into ONE training document under a
    deterministic chat template:

        <|role|>
        text
        <|role|>
        text
        ...

    joined with ``turn_sep`` between turns, turns in stable
    ``(turn_idx, ts)`` order.  This is the standard packing step before
    a transcript corpus enters a pretraining/SFT mix (the rendered
    string is what the tokenizer sees), and the rendered column is also
    the natural conversation-level dedup signature.

    Output: ``(conv_id, n_turns, n_chars, rendered)`` where ``n_chars``
    counts the rendered string.

    NULL ``text`` renders as the empty string (the turn still occupies
    its template slot — dropping it would silently renumber the
    conversation); NULL ``role`` renders as the empty role tag.

    Scale: one conversation-keyed aggregation (shuffle-free over
    ``bucket(conv_id)`` tables), then narrow array expressions — no
    window, no second shuffle, nothing driver-side.  Per-conversation
    memory is the conversation itself, the same bound the flagship
    correction pipeline already carries.
    """
    rendered = F.array_join(
        F.transform(
            F.col("_turns"),
            lambda t: F.concat(
                F.lit(role_open),
                F.coalesce(t["role"], F.lit("")),
                F.lit(role_close),
                F.lit("\n"),
                F.coalesce(t["text"], F.lit("")),
            ),
        ),
        turn_sep,
    )
    return (
        df.groupBy("conv_id")
        .agg(_sorted_turns(df).alias("_turns"))
        .select(
            "conv_id",
            F.size("_turns").cast("long").alias("n_turns"),
            F.length(rendered).cast("long").alias("n_chars"),
            rendered.alias("rendered"),
        )
    )


def validate_turn_sequence(
    df: DataFrame, expected_first: str = "user"
) -> DataFrame:
    """Per-conversation role-sequence validation — the admission gate a
    transcript corpus passes before training: a well-formed conversation
    starts with ``expected_first``, never repeats a role in consecutive
    turns, and has no empty turns.

    Output: ``(conv_id, n_turns, first_role, n_role_repeats,
    n_empty_turns, is_valid)`` with ``is_valid`` ∈ {0,1} (1 iff
    ``first_role = expected_first`` and both defect counters are 0).
    ``n_role_repeats`` counts adjacent turn pairs (in stable order)
    with the same role; ``n_empty_turns`` counts turns whose text is
    NULL or whitespace-only.

    Scale: one conversation-keyed aggregation + narrow array lambdas
    (``zip_with`` over the sorted array against its own tail) — no
    window, no self-join.
    """
    arr = _sorted_turns(df)
    agg = df.groupBy("conv_id").agg(arr.alias("a"))
    n = F.size("a")
    tail = F.slice(F.col("a"), 2, F.greatest(n - 1, F.lit(0)))
    head = F.slice(F.col("a"), 1, F.greatest(n - 1, F.lit(0)))
    repeats = F.size(
        F.filter(
            F.zip_with(
                head, tail, lambda x, y: x["role"].eqNullSafe(y["role"])
            ),
            lambda b: b,
        )
    )
    empties = F.size(
        F.filter(
            F.col("a"),
            lambda t: F.trim(F.coalesce(t["text"], F.lit(""))) == "",
        )
    )
    first_role = F.element_at("a", 1)["role"]
    out = agg.select(
        "conv_id",
        n.cast("long").alias("n_turns"),
        first_role.alias("first_role"),
        repeats.cast("long").alias("n_role_repeats"),
        empties.cast("long").alias("n_empty_turns"),
    )
    return out.withColumn(
        "is_valid",
        (
            # NULL-safe: a NULL first_role is a mismatch (is_valid=0),
            # not a NULL verdict — the documented {0,1} contract
            F.col("first_role").eqNullSafe(F.lit(expected_first))
            & (F.col("n_role_repeats") == 0)
            & (F.col("n_empty_turns") == 0)
        )
        .cast("int")
        .alias("is_valid"),
    )


def flag_boilerplate_turns(
    df: DataFrame,
    max_conv_df: int = 3,
    min_chars: int = 10,
) -> DataFrame:
    """Flag canned boilerplate turns — turns whose normalized text
    appears in MORE than ``max_conv_df`` distinct conversations
    (greeting templates, canned tool banners, autogenerated apologies).
    The CCNet line-frequency idea of
    :func:`~memo_fraktur_ocr_code_spark.operators.curation.strip_boilerplate_lines`
    applied at turn granularity: content that repeats across
    conversations is boilerplate by definition, while legitimate content
    repeats within one conversation at most a handful of times.

    Turns shorter than ``min_chars`` after normalization are exempt
    (short turns — "ok", "yes" — collide by chance and are real
    dialogue).  Normalization = the dedup family's own
    ``normalize_text_col`` (lowercase + whitespace collapse), shared
    function, not a copy.

    Output: every input row (keep-everything contract: downstream
    decides whether to drop, and funnels must see exact counts) plus
    ``is_boilerplate`` ∈ {0,1} and ``turn_conv_df`` (the distinct-
    conversation frequency of the turn's normalized form; reported for
    every non-exempt turn so thresholds can be re-tuned without a
    second pass).

    Scale: one ``(norm_key → approx-distinct-conv)`` aggregation —
    exact ``count(distinct conv_id)`` per key, which Spark plans as two
    hash aggregations with map-side partial distinct — then a join of
    the turn table against the per-key frequency.  The frequency table
    is Zipf-headed; the join is deliberately UNHINTED (same reasoning
    as strip_boilerplate_lines: at a low threshold over a web-scale
    corpus the key table is unbounded, so AQE must pick the strategy).
    """
    from memo_fraktur_ocr_code_spark.operators.dedup import (
        normalize_text_col,
    )

    # Output columns must not silently shadow caller data (ADVICE r5):
    # a pre-existing turn_conv_df/is_boilerplate would be clobbered by
    # the select below — refuse loudly instead.
    for reserved in ("turn_conv_df", "is_boilerplate"):
        if reserved in df.columns:
            raise ValueError(
                "flag_boilerplate_turns: input already has a"
                f" '{reserved}' column; rename it before flagging"
            )
    # Internal key column: pick a name the input provably lacks rather
    # than clobbering a caller's '_bk' (ADVICE r5).  Deterministic —
    # suffix until free, no randomness.
    bk = "_bk"
    while bk in df.columns:
        bk += "_"
    bklen = bk + "len"
    while bklen in df.columns:
        bklen += "_"
    key = normalize_text_col(F.coalesce(F.col("text"), F.lit("")))
    # the frequency key is xxhash64(normalized text) — 8 bytes through
    # the distinct-aggregation and the join instead of the full turn
    # text (r7, guide §2.3; the dedup-module hash-is-identity premise —
    # equal text ⇔ equal hash absent a 64-bit collision, and the
    # min_chars exemption still reads the true normalized length)
    keyed = df.withColumn(bk, F.xxhash64(key)).withColumn(
        bklen, F.length(key)
    )
    freq = (
        keyed.where(F.col(bklen) >= min_chars)
        .groupBy(bk)
        .agg(F.countDistinct("conv_id").alias("turn_conv_df"))
    )
    out = keyed.join(freq, bk, "left").select(
        *[F.col(c) for c in df.columns],
        F.col("turn_conv_df").cast("long").alias("turn_conv_df"),
        F.when(
            F.col("turn_conv_df") > max_conv_df, F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("is_boilerplate"),
    )
    return out


def tool_call_stats(df: DataFrame) -> DataFrame:
    """Per-conversation tool-usage rollup — the feature a transcript
    curation pass needs to stratify an agent-trace corpus by tool mix
    (and to quarantine conversations that loop on one tool).

    A "tool call" is a turn whose ``tool`` column is non-NULL.  Output:
    ``(conv_id, n_turns, n_tool_calls, n_distinct_tools,
    top_tool_count, top_tool)`` where ``top_tool`` is the MODE of the
    tool names, ties broken by the lexicographically smallest name (a
    total order — every engine and partitioning elects the same
    representative, the anchor-text election rule).  Conversations with
    zero tool calls keep their row with zero counts and NULL
    ``top_tool``.

    Scale: two shrinking aggregations — ``(conv_id, tool)`` counts,
    then per-conversation stats — plus a distinct-pair-sized mode
    extraction join; no windows, no corpus-sized second shuffle.
    """
    from memo_fraktur_ocr_code_spark.operators.aggregates import (
        mode_per_key,
    )

    totals = df.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.count("tool").alias("n_tool_calls"),
    )
    pairs = (
        df.where(F.col("tool").isNotNull())
        .groupBy("conv_id", "tool")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = pairs.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_distinct_tools")
    )
    mode = (
        mode_per_key(pairs, ["conv_id"], "tool")
        .withColumnRenamed("mode_value", "top_tool")
        .withColumnRenamed("mode_count", "top_tool_count")
        .join(stats, "conv_id")
    )
    return totals.join(mode, "conv_id", "left").select(
        "conv_id",
        F.col("n_turns").cast("long").alias("n_turns"),
        F.col("n_tool_calls").cast("long").alias("n_tool_calls"),
        F.coalesce("n_distinct_tools", F.lit(0))
        .cast("long")
        .alias("n_distinct_tools"),
        F.coalesce("top_tool_count", F.lit(0))
        .cast("long")
        .alias("top_tool_count"),
        "top_tool",
    )


def sft_context_windows(
    df: DataFrame,
    k: int = 3,
    target_role: str = "assistant",
    turn_sep: str = "\n",
    role_open: str = "<|",
    role_close: str = "|>",
) -> DataFrame:
    """Mine ``(context, target)`` SFT pairs from transcripts: for every
    turn with ``role = target_role``, the context is the previous
    ``k`` turns (stable ``(turn_idx, ts)`` order) rendered under the
    same chat template as :func:`render_conversation`, and the target
    is the turn's own text.  Turns with an empty context window (a
    conversation-opening assistant turn) are excluded — there is
    nothing to condition on.

    Output: ``(conv_id, turn_idx, n_context_turns, context, target)``.

    Scale: one conversation-partitioned window with a BOUNDED frame
    (``rowsBetween(-k, -1)``) — per-row state is at most ``k`` turns
    regardless of conversation length, so whale conversations cost
    memory O(k), not O(conversation).  The single shuffle keys on
    ``conv_id`` (shuffle-free over ``bucket(conv_id)`` tables).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx", "ts", "role", "text")
        .rowsBetween(-k, -1)
    )
    turn_tpl = F.concat(
        F.lit(role_open),
        F.coalesce(F.col("role"), F.lit("")),
        F.lit(role_close),
        F.lit("\n"),
        F.coalesce(F.col("text"), F.lit("")),
    )
    ctx = F.collect_list(turn_tpl).over(w)
    return (
        df.withColumn("_ctx", ctx)
        .where(
            (F.col("role") == target_role) & (F.size("_ctx") > 0)
        )
        .select(
            "conv_id",
            F.col("turn_idx").cast("long").alias("turn_idx"),
            F.size("_ctx").cast("long").alias("n_context_turns"),
            F.array_join("_ctx", turn_sep).alias("context"),
            F.coalesce(F.col("text"), F.lit("")).alias("target"),
        )
    )


def split_sessions(df: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Split each conversation into sessions at time gaps: a turn whose
    ``ts`` is more than ``gap_s`` seconds after the previous turn (in
    stable ``(turn_idx, ts)`` order) starts a new session.  Long-running
    agent transcripts routinely splice several human sittings into one
    ``conv_id``; training mixes want the sitting, not the splice — the
    classic sessionization pattern (the reference's W2 sentence-boundary
    running sum, applied to timestamps).

    Output: every input row plus ``prev_gap_s`` (seconds since the
    previous turn; NULL for the first turn of a conversation) and
    ``session_idx`` (0-based, increments at every gap > ``gap_s``).
    NULL ``ts`` never starts a new session (a NULL gap compares false),
    mirroring the boundary-sum pattern's treatment of missing markers.

    Scale: one conversation-partitioned window pair (lag + running sum)
    over the same ``conv_id`` key everything else shuffles on —
    shuffle-free over ``bucket(conv_id)`` tables; per-row state is one
    lag value.
    """
    from pyspark.sql import Window

    order = [F.col(c) for c in _SORT_FIELDS]
    w = Window.partitionBy("conv_id").orderBy(*order)
    gap = (
        F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    )
    boundary = F.when(gap > gap_s, 1).otherwise(0)
    running = Window.partitionBy("conv_id").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.select(
        "*",
        gap.cast("long").alias("prev_gap_s"),
        (F.sum(boundary).over(running)).cast("long").alias("session_idx"),
    )


def conversation_prefix_groups(df: DataFrame, k: int = 2) -> DataFrame:
    """Group conversations by their rendered first-``k`` turns — the
    conversation-granularity dedup signal for agent-trace corpora, where
    thousands of runs share one system prompt + opening user message and
    training on every copy overweights the shared prefix.  (SURVEY §2's
    exact dedup works at document granularity; this is its transcript
    sibling, keyed on the prefix instead of the whole body.)

    The signature is ``md5`` over an INJECTIVE encoding of the first
    ``k`` turns' (role, text) pairs: every field is length-prefixed
    (``len:value``), so turn text that happens to contain the template
    markers or separators cannot forge a collision with a structurally
    different conversation (a chat-template rendering is ambiguous —
    ``"hello\\n<|assistant|>\\nok"`` in one turn renders like two
    turns).  NULLs encode as empty fields, so NULL-text prefixes
    collide deterministically.  Conversations with fewer than ``k``
    turns sign all their turns.

    Output: ``(conv_id, n_turns, prefix_sig, group_size, is_kept)`` —
    ``is_kept`` = 1 on the lexicographically smallest ``conv_id`` of
    each group (total order; every engine elects the same keeper),
    keep-everything contract otherwise.

    Scale: one conversation-keyed aggregation builds the signature
    (shuffle-free over ``bucket(conv_id)``), then one signature-keyed
    aggregation over the already-conversation-sized table computes group
    size + keeper, joined back on the signature.  Both post-aggregation
    tables are conversation-counted, not turn-counted.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def _enc(c):
        v = F.coalesce(c, F.lit(""))
        return F.concat(F.length(v).cast("string"), F.lit(":"), v)

    rendered_prefix = F.array_join(
        F.transform(
            F.slice(F.col("_turns"), 1, k),
            lambda t: F.concat(
                _enc(t["role"]), F.lit("#"), _enc(t["text"])
            ),
        ),
        "|",
    )
    convs = (
        df.groupBy("conv_id")
        .agg(_sorted_turns(df).alias("_turns"))
        .select(
            "conv_id",
            F.size("_turns").cast("long").alias("n_turns"),
            F.md5(rendered_prefix).alias("prefix_sig"),
        )
    )
    groups = convs.groupBy("prefix_sig").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.min("conv_id").alias("_keeper"),
    )
    return convs.join(groups, "prefix_sig").select(
        "conv_id",
        "n_turns",
        "prefix_sig",
        "group_size",
        F.when(F.col("conv_id") == F.col("_keeper"), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_kept"),
    )


def truncate_to_token_budget(
    df: DataFrame, budget: int = 512
) -> DataFrame:
    """Context-budget suffix truncation: keep the longest SUFFIX of each
    conversation whose total whitespace-token count fits ``budget`` —
    the packing rule for SFT corpora where the most recent turns carry
    the target behavior and the model's context window is fixed.  A
    turn is kept iff the running token total from the conversation END
    back to (and including) that turn is ≤ ``budget``; one oversized
    turn at the tail therefore evicts everything before it, and is
    itself dropped only if it alone exceeds the budget.

    Output: every input row (keep-everything: funnels need exact
    counts) plus ``n_tokens`` (whitespace tokens in the turn; NULL text
    = 0), ``cum_from_end`` (inclusive running total from the end in
    stable order), and ``keep`` ∈ {0,1}.

    Scale: one conversation-partitioned window with a running sum in
    REVERSE stable order — the same single ``conv_id`` shuffle as every
    other operator here (none over ``bucket(conv_id)`` tables); per-row
    state is one accumulator.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    from pyspark.sql import Window

    rev = [F.col(c).desc() for c in _SORT_FIELDS]
    w = (
        Window.partitionBy("conv_id")
        .orderBy(*rev)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = F.size(
        F.filter(
            F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"),
            lambda t: t != "",
        )
    )
    out = df.select(
        "*",
        n_tok.cast("long").alias("n_tokens"),
    )
    cum = F.sum("n_tokens").over(w)
    return out.select(
        "*",
        cum.cast("long").alias("cum_from_end"),
    ).withColumn(
        "keep",
        F.when(F.col("cum_from_end") <= budget, 1)
        .otherwise(0)
        .cast("int"),
    )
