"""Deterministic synthetic transcript fixtures (no external data).

Synthesises the input tables described in FIXTURES.md at arbitrary scale,
seeded by content hashes (md5) only — no RNG state, no wall clock — so
every run, process and executor produces identical bytes.

Tables produced:

* transcripts      (conv_id, turn_idx, role, text, tool, ts)   noisy base
* transcripts_alt  (conv_id, turn_idx, text)                   alt channel
* lexicon          [(token, freq)] descending                  broadcast side

Noise injected into the base channel (so every pipeline stage has work):
ſ for s and œ-family for æ (correct_easy), o/a/t for ø/æ/k with a clean
alt channel (correct_hard), small in-lexicon typos (sym_wordcorrect),
end-of-line and end-of-turn hyphenation (fix_hyphens), page-number first
lines and blank lines (clean_page_lines), noise tokens and 1-char tokens
(suggestion guards).  Canonical reference cases (tyske/tyste,
største/ftørfte — README.md:232-234) are planted verbatim.
"""

from __future__ import annotations

import datetime as _dt
import hashlib

# A small Danish-ish vocabulary; includes the canonical correction examples.
VOCAB = (
    "og i det en at der til han hun de som paa med for af ikke var den da "
    "saa sig men et have om ved kunde skulle vilde fra du jeg hans hendes "
    "over under mellem gennem alle nogle mange faa stor lille gamle unge "
    "tyske største stillinger følge søge høre læse skrive huset gaarden "
    "skoven marken himlen jorden vandet ilden dagen natten aaret tiden "
    "manden konen barnet folket kongen præsten byen landet vejen døren "
    "vinduet bordet stolen bogen brevet ordet stemmen øjnene hænderne "
    "hjertet tankerne drømme glæde sorg frygt haab kærlighed venskab "
    "fjende nabo broder søster fader moder sig"
).split()

ROLES = ("user", "assistant", "tool")
TOOLS = (None, "search", "calc", None, "browse", None)

NOISE_LINE_TOKENS = ("*", "ð", "—", "——", "———", "—————", "I", "a", "s")

_EPOCH = _dt.datetime(1870, 1, 1)


def _h(*parts) -> int:
    """Deterministic 64-bit hash of the parts."""
    s = "\x1f".join(str(p) for p in parts)
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _word(conv: str, t: int, li: int, wi: int) -> str:
    w = VOCAB[_h("w", conv, t, li, wi) % len(VOCAB)]
    if _h("cap", conv, t, li, wi) % 4 == 0:
        w = w.capitalize()
    return w


def _corrupt_base(word: str, key: int) -> str:
    """Deterministic noisy rendering of a clean word (base OCR channel)."""
    r = key % 100
    if word == "sig" and r < 50:
        # canonical false-positive-cancellation case: 'sie' suggests 'sig'
        # but the (sie, sig) pair is cancelled (correct_ocr.py:361-369)
        return "sie"
    if r < 14:
        w = word.replace("æ", "œ", 1)  # correct_easy target
    elif r < 22:
        w = word.replace("s", "ſ", 1)  # correct_easy target
    elif r < 34:
        w = word.replace("ø", "o", 1)  # correct_hard target (o→ø)
    elif r < 42:
        w = word.replace("æ", "a", 1)  # correct_hard target (a→æ)
    elif r < 48:
        w = word.replace("k", "t", 1)  # correct_hard target (t→k)
    elif r < 58 and len(word) > 3:
        i = key % (len(word) - 2) + 1  # small typo for SymSpell
        w = word[:i] + "c" + word[i + 1 :]
    elif r < 62 and len(word) > 3:
        i = key % (len(word) - 2) + 1
        w = word[:i] + word[i + 1 :]  # deletion typo for SymSpell
    else:
        w = word
    return w


def _corrupt_alt(word: str, key: int) -> str:
    """Alt channel: keeps the vowels/consonants the base got wrong, with
    its own mild unrelated noise."""
    r = key % 100
    if r < 8 and len(word) > 3:
        i = key % (len(word) - 2) + 1
        return word[:i] + "c" + word[i + 1 :]
    return word


def _turn_count(conv_i: int, turns_per_conv: int) -> int:
    if conv_i % 7 == 0:
        return turns_per_conv * 8  # long-conversation skew
    return max(1, turns_per_conv + (conv_i % 3) - 1)


def make_fixture(
    n_convs: int = 10,
    turns_per_conv: int = 4,
    lines_per_turn: int = 3,
    words_per_line: int = 6,
):
    """Build (transcripts, transcripts_alt, lexicon) deterministically.

    Returns plain-Python row dicts — usable for both
    ``spark.createDataFrame`` and the single-node oracle.
    """
    transcripts: list[dict] = []
    alt_rows: list[dict] = []
    freq: dict[str, int] = {}

    for ci in range(n_convs):
        conv_id = f"conv{ci:04d}"
        n_turns = _turn_count(ci, turns_per_conv)
        carry = ""  # word fragment donated to the start of the next turn
        for t in range(n_turns):
            base_lines: list[str] = []
            alt_lines: list[str] = []
            n_lines = max(1, lines_per_turn + (_h("nl", conv_id, t) % 3) - 1)
            for li in range(n_lines):
                n_words = max(
                    2, words_per_line + (_h("nw", conv_id, t, li) % 5) - 2
                )
                clean = [_word(conv_id, t, li, wi) for wi in range(n_words)]
                # Plant canonical README cases deterministically.
                if _h("canon", conv_id, t, li) % 23 == 0:
                    clean[0] = "tyske"
                for w in clean:
                    lw = w.lower()
                    freq[lw] = freq.get(lw, 0) + 1
                base = [
                    _corrupt_base(w, _h("nz", conv_id, t, li, wi))
                    for wi, w in enumerate(clean)
                ]
                alt = [
                    _corrupt_alt(w, _h("az", conv_id, t, li, wi))
                    for wi, w in enumerate(clean)
                ]
                # occasional noise / 1-char tokens
                if _h("noise", conv_id, t, li) % 9 == 0:
                    nz = NOISE_LINE_TOKENS[
                        _h("nzch", conv_id, t, li) % len(NOISE_LINE_TOKENS)
                    ]
                    base.append(nz)
                    alt.append(nz)
                base_line = " ".join(base)
                alt_line = " ".join(alt)
                # end-of-line hyphenation inside the turn
                if (
                    li < n_lines - 1
                    and _h("hyph", conv_id, t, li) % 6 == 0
                    and len(base[-1]) > 4
                ):
                    head, tail = base_line.rsplit(" ", 1)
                    cut = len(tail) // 2
                    if cut >= 2:
                        base_line = f"{head} {tail[:cut]}-"
                        base_lines.append(base_line)
                        alt_lines.append(alt_line)
                        base_lines.append(tail[cut:])  # continuation line
                        alt_lines.append("")
                        continue
                base_lines.append(base_line)
                alt_lines.append(alt_line)

            # the donated hyphen fragment lands on the first TEXT line —
            # BEFORE the blank/page-number injections, which simulate
            # artifacts the scanner prepends to the page.  Prepending
            # after the injections glued the fragment onto the injected
            # page-number line, so that line stopped matching the
            # pagenum filter and the planted clean_page_lines case never
            # triggered (ADVICE r3).
            if carry:
                base_lines[0] = (
                    f"{carry}{base_lines[0]}" if base_lines else carry
                )
                carry = ""

            # blank line + page-number top line injections
            if _h("blank", conv_id, t) % 5 == 0:
                base_lines.insert(
                    min(1, len(base_lines)), "   " if t % 2 else ""
                )
            if _h("pgnum", conv_id, t) % 4 == 0:
                base_lines.insert(0, f" {t % 200} ")

            # end-of-turn hyphenation (cross-turn dehyphenation case)
            if t < n_turns - 1 and _h("xhyph", conv_id, t) % 7 == 0:
                last = base_lines[-1].rsplit(" ", 1)
                if len(last) == 2 and len(last[1]) > 4:
                    cut = len(last[1]) // 2
                    if cut >= 2:
                        base_lines[-1] = f"{last[0]} {last[1][:cut]}-"
                        carry = last[1][cut:] + " "

            text = "\n".join(base_lines)
            alt_text = "\n".join(alt_lines)
            ts = _EPOCH + _dt.timedelta(
                days=ci, seconds=t * 60 + _h("ts", conv_id, t) % 50
            )
            transcripts.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": ROLES[t % 3],
                    "text": text,
                    "tool": TOOLS[_h("tool", conv_id, t) % len(TOOLS)],
                    "ts": ts,
                }
            )
            alt_rows.append(
                {"conv_id": conv_id, "turn_idx": t, "text": alt_text}
            )

    # Lexicon: clean vocabulary with Zipf-ish counts (scaled corpus counts),
    # descending (token asc tie-break) — format of unigrams_*.txt
    # (correct_ocr.py:208: term index 0, count index 1).
    lexicon = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    lexicon = [(t, c * 10) for t, c in lexicon]
    return transcripts, alt_rows, lexicon
