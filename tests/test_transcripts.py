"""Conversation-level transcript operators (operators/transcripts.py):
chat-template rendering, role-sequence validation, boilerplate-turn
flagging, tool-usage rollups, SFT context-window mining — plus the
tf-idf keyword extractor (operators/textstats.py)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from memo_fraktur_ocr_code_spark.operators.textstats import (
    tfidf_topk_terms,
)
from memo_fraktur_ocr_code_spark.operators.transcripts import (
    flag_boilerplate_turns,
    render_conversation,
    sft_context_windows,
    tool_call_stats,
    validate_turn_sequence,
)

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

T0 = datetime.datetime(2023, 11, 14, 22, 13, 20)


def _ts(i: int) -> datetime.datetime:
    return T0 + datetime.timedelta(minutes=i)


@pytest.fixture(scope="module")
def turns(spark):
    rows = [
        # well-formed conversation with one tool call
        ("c1", 0, "user", "hello there please help", None, _ts(0)),
        ("c1", 1, "assistant", "sure thing", None, _ts(1)),
        ("c1", 2, "tool", '{"result": 42}', "search", _ts(2)),
        ("c1", 3, "assistant", "the answer is 42", None, _ts(3)),
        # malformed: starts with assistant, repeats it, has a blank turn
        ("c2", 0, "assistant", "I begin", None, _ts(0)),
        ("c2", 1, "assistant", "  ", None, _ts(1)),
        ("c2", 2, "user", "hello there please help", None, _ts(2)),
    ]
    # five more conversations sharing the canned greeting + tool churn
    for c in ("c3", "c4", "c5", "c6", "c7"):
        rows += [
            (c, 0, "user", "hello there please help", None, _ts(0)),
            (c, 1, "tool", "did one thing", "alpha", _ts(1)),
            (c, 2, "tool", "did another", "beta", _ts(2)),
            (c, 3, "tool", "did a third", "alpha", _ts(3)),
        ]
    return spark.createDataFrame(rows, SCHEMA)


def test_render_template_and_order(spark, turns):
    out = {
        r["conv_id"]: r
        for r in render_conversation(turns).collect()
    }
    assert out["c1"]["n_turns"] == 4
    assert out["c1"]["rendered"] == (
        "<|user|>\nhello there please help\n"
        "<|assistant|>\nsure thing\n"
        '<|tool|>\n{"result": 42}\n'
        "<|assistant|>\nthe answer is 42"
    )
    assert out["c1"]["n_chars"] == len(out["c1"]["rendered"])
    # order is (turn_idx, ts), not arrival order: shuffle the input
    shuffled = turns.orderBy(F.rand(7))
    out2 = {
        r["conv_id"]: r["rendered"]
        for r in render_conversation(shuffled).collect()
    }
    assert out2 == {k: v["rendered"] for k, v in out.items()}


def test_render_null_text_keeps_slot(spark):
    df = spark.createDataFrame(
        [
            ("x", 0, "user", None, None, _ts(0)),
            ("x", 1, "assistant", "hi", None, _ts(1)),
        ],
        SCHEMA,
    )
    (row,) = render_conversation(df).collect()
    assert row["rendered"] == "<|user|>\n\n<|assistant|>\nhi"
    assert row["n_turns"] == 2


def test_validate_flags(spark, turns):
    out = {
        r["conv_id"]: r
        for r in validate_turn_sequence(turns).collect()
    }
    good = out["c1"]
    assert (
        good["first_role"],
        good["n_role_repeats"],
        good["n_empty_turns"],
        good["is_valid"],
    ) == ("user", 0, 0, 1)
    bad = out["c2"]
    assert bad["first_role"] == "assistant"
    assert bad["n_role_repeats"] == 1  # assistant,assistant
    assert bad["n_empty_turns"] == 1  # the whitespace-only turn
    assert bad["is_valid"] == 0
    # tool,tool,tool = 2 adjacent repeats
    assert out["c3"]["n_role_repeats"] == 2
    assert out["c3"]["is_valid"] == 0


def test_validate_single_turn_conv(spark):
    df = spark.createDataFrame(
        [("solo", 0, "user", "hi there friend", None, _ts(0))], SCHEMA
    )
    (row,) = validate_turn_sequence(df).collect()
    assert row["n_turns"] == 1
    assert row["n_role_repeats"] == 0
    assert row["is_valid"] == 1


def test_boilerplate_flags_cross_conv_repeats(spark, turns):
    out = flag_boilerplate_turns(turns, max_conv_df=3, min_chars=10)
    rows = {
        (r["conv_id"], r["turn_idx"]): r for r in out.collect()
    }
    # keep-everything: every input row survives
    assert len(rows) == turns.count()
    # the greeting appears in 7 distinct conversations (c1, c2 turn 2,
    # and c3..c7) > 3 → flagged
    greet = rows[("c1", 0)]
    assert greet["turn_conv_df"] == 7
    assert greet["is_boilerplate"] == 1
    # within-conversation-unique content is not boilerplate
    assert rows[("c1", 3)]["is_boilerplate"] == 0
    assert rows[("c1", 3)]["turn_conv_df"] == 1
    # 'did one thing' appears in 5 convs > 3 → flagged
    assert rows[("c3", 1)]["is_boilerplate"] == 1


def test_boilerplate_short_exemption_and_norm_key(spark):
    rows = []
    for i in range(6):
        rows.append((f"k{i}", 0, "user", "ok", None, _ts(0)))
        # same normalized form, different casing/whitespace
        rows.append(
            (f"k{i}", 1, "assistant", f"  Canned   ANSWER body {'x'*4} ",
             None, _ts(1))
        )
    df = spark.createDataFrame(rows, SCHEMA)
    out = {
        (r["conv_id"], r["turn_idx"]): r
        for r in flag_boilerplate_turns(
            df, max_conv_df=3, min_chars=10
        ).collect()
    }
    # 'ok' repeats in 6 convs but is short → exempt, df not reported
    assert out[("k0", 0)]["is_boilerplate"] == 0
    assert out[("k0", 0)]["turn_conv_df"] is None
    # casing/whitespace variants collapse to one normalized key
    assert out[("k0", 1)]["turn_conv_df"] == 6
    assert out[("k0", 1)]["is_boilerplate"] == 1


def test_tool_call_stats(spark, turns):
    out = {r["conv_id"]: r for r in tool_call_stats(turns).collect()}
    c1 = out["c1"]
    assert (c1["n_turns"], c1["n_tool_calls"]) == (4, 1)
    assert (c1["n_distinct_tools"], c1["top_tool"]) == (1, "search")
    # zero-tool conversation keeps its row with NULL mode
    c2 = out["c2"]
    assert (c2["n_tool_calls"], c2["n_distinct_tools"]) == (0, 0)
    assert c2["top_tool"] is None and c2["top_tool_count"] == 0
    # alpha×2 beats beta×1
    c3 = out["c3"]
    assert (c3["top_tool"], c3["top_tool_count"]) == ("alpha", 2)


def test_tool_mode_tie_breaks_lexicographically(spark):
    df = spark.createDataFrame(
        [
            ("t", 0, "tool", "a", "zeta", _ts(0)),
            ("t", 1, "tool", "b", "alpha", _ts(1)),
        ],
        SCHEMA,
    )
    (row,) = tool_call_stats(df).collect()
    assert row["top_tool"] == "alpha"
    assert row["top_tool_count"] == 1


def test_sft_context_windows(spark, turns):
    out = sft_context_windows(turns, k=2)
    rows = {
        (r["conv_id"], r["turn_idx"]): r for r in out.collect()
    }
    # the opening assistant turn of c2 has no context → excluded
    assert ("c2", 0) not in rows
    # c1 turn 1: one context turn (the user opener)
    r1 = rows[("c1", 1)]
    assert r1["n_context_turns"] == 1
    assert r1["context"] == "<|user|>\nhello there please help"
    assert r1["target"] == "sure thing"
    # c1 turn 3: exactly k=2 most recent turns, in order
    r3 = rows[("c1", 3)]
    assert r3["n_context_turns"] == 2
    assert r3["context"] == (
        '<|assistant|>\nsure thing\n<|tool|>\n{"result": 42}'
    )
    # only assistant turns produce pairs
    assert all(k[0] in ("c1", "c2") for k in rows)


def test_sft_k_validation(spark, turns):
    with pytest.raises(ValueError):
        sft_context_windows(turns, k=0)


def test_tfidf_topk(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog ate the cat food"),
            (3, "quantum flux capacitor the"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_topk_terms(docs, k=2)
    rows = [
        (r["id"], r["rnk"], r["term"], r["tf"], r["doc_freq"],
         r["score_e6"])
        for r in out.orderBy("id", "rnk").collect()
    ]
    # doc 1: 'the'×2 (df=3 → idf=1e6) score 2e6 beats the df=1 singles
    # (3e6 each... check: 'mat' tf=1 df=1 → 3e6 > 2e6) — so winners are
    # the unique terms, ties broken alphabetically: mat < on < sat
    assert rows[0] == (1, 1, "mat", 1, 1, 3_000_000)
    assert rows[1] == (1, 2, "on", 1, 1, 3_000_000)
    # doc 3: all unique terms score 3e6; 'the' (df=3) scores 1e6
    assert rows[4] == (3, 1, "capacitor", 1, 1, 3_000_000)
    assert rows[5] == (3, 2, "flux", 1, 1, 3_000_000)
    # every document emits at most k rows and ranks are 1..k
    per_doc = out.groupBy("id").count().collect()
    assert all(r["count"] <= 2 for r in per_doc)


def test_tfidf_min_chars_and_validation(spark):
    docs = spark.createDataFrame(
        [(1, "a a a bb cc")], "doc_id long, text string"
    )
    out = tfidf_topk_terms(docs, k=10, min_term_chars=2)
    terms = {r["term"] for r in out.collect()}
    assert terms == {"bb", "cc"}
    with pytest.raises(ValueError):
        tfidf_topk_terms(docs, k=0)


def test_split_sessions_gaps(spark):
    rows = [
        ("s1", 0, "user", "a", None, T0),
        ("s1", 1, "assistant", "b", None, T0 + datetime.timedelta(minutes=2)),
        # 2-hour gap → new session
        ("s1", 2, "user", "c", None, T0 + datetime.timedelta(hours=2)),
        ("s1", 3, "assistant", "d", None,
         T0 + datetime.timedelta(hours=2, minutes=1)),
        # another long gap
        ("s1", 4, "user", "e", None, T0 + datetime.timedelta(hours=9)),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    from memo_fraktur_ocr_code_spark.operators.transcripts import (
        split_sessions,
    )

    out = {
        r["turn_idx"]: r for r in split_sessions(df, gap_s=1800).collect()
    }
    assert [out[i]["session_idx"] for i in range(5)] == [0, 0, 1, 1, 2]
    assert out[0]["prev_gap_s"] is None
    assert out[1]["prev_gap_s"] == 120
    assert out[2]["prev_gap_s"] == 2 * 3600 - 120


def test_split_sessions_null_ts_never_splits(spark):
    rows = [
        ("n1", 0, "user", "a", None, T0),
        ("n1", 1, "assistant", "b", None, None),
        ("n1", 2, "user", "c", None, T0 + datetime.timedelta(hours=3)),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    from memo_fraktur_ocr_code_spark.operators.transcripts import (
        split_sessions,
    )

    out = {r["turn_idx"]: r for r in split_sessions(df).collect()}
    # NULL gaps compare false on both sides of the NULL ts
    assert [out[i]["session_idx"] for i in range(3)] == [0, 0, 0]
    assert out[1]["prev_gap_s"] is None and out[2]["prev_gap_s"] is None


def test_prefix_groups(spark):
    shared = [
        (0, "user", "same system prompt"),
        (1, "assistant", "same opener"),
    ]
    rows = []
    for c in ("p1", "p2", "p3"):
        for i, role, text in shared:
            rows.append((c, i, role, text, None, _ts(i)))
        rows.append((c, 2, "user", f"unique tail {c}", None, _ts(2)))
    rows += [
        ("q1", 0, "user", "different prompt", None, _ts(0)),
        ("q1", 1, "assistant", "same opener", None, _ts(1)),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    from memo_fraktur_ocr_code_spark.operators.transcripts import (
        conversation_prefix_groups,
    )

    out = {
        r["conv_id"]: r
        for r in conversation_prefix_groups(df, k=2).collect()
    }
    assert len(out) == 4  # keep-everything: one row per conversation
    sigs = {c: out[c]["prefix_sig"] for c in out}
    assert sigs["p1"] == sigs["p2"] == sigs["p3"] != sigs["q1"]
    assert out["p1"]["group_size"] == 3
    assert (
        out["p1"]["is_kept"],
        out["p2"]["is_kept"],
        out["p3"]["is_kept"],
    ) == (1, 0, 0)
    assert out["q1"]["group_size"] == 1 and out["q1"]["is_kept"] == 1
    with pytest.raises(ValueError):
        conversation_prefix_groups(df, k=0)


def test_prefix_groups_short_conv_signs_whole_rendering(spark):
    rows = [
        ("a", 0, "user", "hi", None, _ts(0)),
        ("b", 0, "user", "hi", None, _ts(0)),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    from memo_fraktur_ocr_code_spark.operators.transcripts import (
        conversation_prefix_groups,
    )

    out = {
        r["conv_id"]: r
        for r in conversation_prefix_groups(df, k=5).collect()
    }
    assert out["a"]["prefix_sig"] == out["b"]["prefix_sig"]
    assert out["a"]["group_size"] == 2
    assert (out["a"]["is_kept"], out["b"]["is_kept"]) == (1, 0)


def test_truncate_to_token_budget(spark):
    rows = [
        ("t1", 0, "user", "one two three four five", None, _ts(0)),  # 5
        ("t1", 1, "assistant", "a b c d", None, _ts(1)),  # 4
        ("t1", 2, "user", "x y z", None, _ts(2)),  # 3
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    from memo_fraktur_ocr_code_spark.operators.transcripts import (
        truncate_to_token_budget,
    )

    out = {
        r["turn_idx"]: r
        for r in truncate_to_token_budget(df, budget=8).collect()
    }
    assert [out[i]["n_tokens"] for i in range(3)] == [5, 4, 3]
    assert [out[i]["cum_from_end"] for i in range(3)] == [12, 7, 3]
    assert [out[i]["keep"] for i in range(3)] == [0, 1, 1]
    with pytest.raises(ValueError):
        truncate_to_token_budget(df, budget=0)


def test_truncate_oversized_tail_evicts_everything(spark):
    rows = [
        ("t2", 0, "user", "small", None, _ts(0)),
        ("t2", 1, "assistant", "way too many tokens here", None, _ts(1)),
        ("t2", 2, "user", None, None, _ts(2)),  # NULL text = 0 tokens
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    from memo_fraktur_ocr_code_spark.operators.transcripts import (
        truncate_to_token_budget,
    )

    out = {
        r["turn_idx"]: r
        for r in truncate_to_token_budget(df, budget=2).collect()
    }
    assert out[2]["n_tokens"] == 0 and out[2]["keep"] == 1
    # the 5-token turn alone exceeds the budget → dropped, and so is
    # everything before it
    assert out[1]["keep"] == 0 and out[0]["keep"] == 0


def test_validate_null_first_role_is_invalid_not_null(spark):
    df = spark.createDataFrame(
        [
            ("nr", 0, None, "hi there friend", None, _ts(0)),
            ("nr", 1, "assistant", "hello back", None, _ts(1)),
        ],
        SCHEMA,
    )
    (row,) = validate_turn_sequence(df).collect()
    # NULL first_role is a mismatch → 0, never a NULL verdict
    assert row["is_valid"] == 0


def test_prefix_sig_is_injective_against_template_forgery(spark):
    from memo_fraktur_ocr_code_spark.operators.transcripts import (
        conversation_prefix_groups,
    )

    # one turn whose TEXT embeds a rendered-looking second turn vs the
    # real two-turn conversation: a template-based signature would
    # collide; the length-prefixed encoding must not
    forged = [
        ("forge", 0, "user", "hello\n<|assistant|>\nok", None, _ts(0)),
        ("forge", 1, "assistant", "tail", None, _ts(1)),
    ]
    real = [
        ("real", 0, "user", "hello", None, _ts(0)),
        ("real", 1, "assistant", "ok", None, _ts(1)),
    ]
    df = spark.createDataFrame(forged + real, SCHEMA)
    out = {
        r["conv_id"]: r["prefix_sig"]
        for r in conversation_prefix_groups(df, k=2).collect()
    }
    assert out["forge"] != out["real"]
