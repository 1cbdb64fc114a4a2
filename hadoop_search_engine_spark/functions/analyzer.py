"""Analysis chain: stopword removal + stemming on top of the tokenizer.

The reference engine has no analysis beyond lowercase + punctuation
strip (client/src/utils/searchProcessor.ts:5); every real full-text
engine layers token filters on top of that — Lucene's StandardAnalyzer
is tokenize -> lowercase -> stopword filter, and the stemming analyzers
(EnglishAnalyzer) add a stemmer. This module supplies that layer with
the same multi-implementation parity contract as the tokenizer: the
index build, the query parser, and the DuckDB oracle must analyze
byte-identically, or queries silently miss documents (the classic
"analyzer mismatch" bug class).

Two stemmers:

* ``stem="s"`` — the Harman S-stemmer (Donna Harman, "How effective is
  suffixing?", JASIS 42(1), 1991): three ordered plural rules
  (ies->y / es->e-drop / s-drop with guard lists). Weak but cheap and
  — crucially — expressible as pure CASE arithmetic, so the whole
  analyzed pipeline runs JVM-side in Spark AND replays exactly in the
  DuckDB oracle (:func:`sql_analyze_duckdb`).
* ``stem="porter"`` — the full Porter algorithm (M.F. Porter, "An
  algorithm for suffix stripping", Program 14(3), 1980), the classic
  English stemmer behind Lucene's PorterStemFilter. Rule-per-suffix
  logic, so the Spark path runs it as an Arrow-batched pandas UDF with
  per-batch unique-token memoization (a Zipfian batch has far fewer
  distinct tokens than tokens — the stemmer runs once per distinct).
  No SQL replay exists offline (DuckDB's ``stem()`` lives in the FTS
  extension, not installable here), so Porter correctness is pinned by
  golden vectors from the published algorithm instead.

Index integration: ``build_index(stopwords=..., stem=...)`` rewrites
the corpus text column through :func:`analyzed_text_col` BEFORE the
(unchanged) tokenize passes and records the analyzer in stats.json;
the query side reads it back and pushes every query token through
:func:`make_token_fn` — index and query can never disagree. The
rewrite round-trips exactly: analyzed tokens contain no whitespace
(tokens come from a whitespace split) and no ``[.,!?]`` (stripped
before analysis; stemmers only remove/replace trailing letters), so
``tokenize(" ".join(analyze(text))) == analyze(text)`` — a property
test pins this.

Position semantics: stopword removal re-numbers positions contiguously
(the analyzed text simply no longer contains the stopword), i.e. the
"no position increments" variant — ``"the quick brown"`` indexes
``quick`` at 0, ``brown`` at 1, so the phrase query ``"quick brown"``
matches across a removed stopword. Lucene's default leaves gaps; both
are standard, ours is the one consistent with rebuilding text.
"""

from __future__ import annotations

import re
from typing import Callable, Iterable, Sequence

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from .tokenizer import tokenize, tokens_col

# Lucene's classic English stopword set (StopAnalyzer /
# EnglishAnalyzer.ENGLISH_STOP_WORDS_SET — 33 words, public constant
# since Lucene 1.x).
ENGLISH_STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "there", "these", "they",
    "this", "to", "was", "will", "with",
)

STEM_MODES = ("none", "s", "porter")


# ---------------------------------------------------------------------------
# ASCII folding (Lucene ASCIIFoldingFilter, Latin-1 Supplement +
# Latin Extended-A scope) — a FIXED character map, deliberately not a
# library Unicode normalize: a fixed table is replayable byte-identically
# as Python str.translate, a Spark JVM translate()+replace() chain, and
# a DuckDB translate()+replace() chain (PostgreSQL translate semantics:
# surplus source characters with no target are DELETED — which is how
# the combining-mark strip rides the same call).
# ---------------------------------------------------------------------------

# single-char folds (lowercase forms only: the tokenizer has already
# lowercased, and JVM/Python/utf8proc lower() agree on this range)
FOLD_SINGLE: dict[str, str] = {
    "à": "a", "á": "a", "â": "a", "ã": "a", "ä": "a", "å": "a",
    "ā": "a", "ă": "a", "ą": "a",
    "ç": "c", "ć": "c", "ĉ": "c", "ċ": "c", "č": "c",
    "ď": "d", "đ": "d", "ð": "d",
    "è": "e", "é": "e", "ê": "e", "ë": "e", "ē": "e", "ĕ": "e",
    "ė": "e", "ę": "e", "ě": "e",
    "ĝ": "g", "ğ": "g", "ġ": "g", "ģ": "g",
    "ĥ": "h", "ħ": "h",
    "ì": "i", "í": "i", "î": "i", "ï": "i", "ĩ": "i", "ī": "i",
    "ĭ": "i", "į": "i", "ı": "i",
    "ĵ": "j",
    "ķ": "k",
    "ĺ": "l", "ļ": "l", "ľ": "l", "ŀ": "l", "ł": "l",
    "ñ": "n", "ń": "n", "ņ": "n", "ň": "n", "ŋ": "n",
    "ò": "o", "ó": "o", "ô": "o", "õ": "o", "ö": "o", "ø": "o",
    "ō": "o", "ŏ": "o", "ő": "o",
    "ŕ": "r", "ŗ": "r", "ř": "r",
    "ś": "s", "ŝ": "s", "ş": "s", "š": "s",
    "ţ": "t", "ť": "t", "ŧ": "t",
    "ù": "u", "ú": "u", "û": "u", "ü": "u", "ũ": "u", "ū": "u",
    "ŭ": "u", "ů": "u", "ű": "u", "ų": "u",
    "ŵ": "w",
    "ý": "y", "ÿ": "y", "ŷ": "y",
    "ź": "z", "ż": "z", "ž": "z",
}

# multi-char folds — translate() is 1:1, so these run as replace()s first
FOLD_MULTI: tuple[tuple[str, str], ...] = (
    ("ß", "ss"), ("æ", "ae"), ("œ", "oe"), ("þ", "th"), ("ĳ", "ij"),
)

# combining marks U+0300..U+036F: deleted (Python lower() of e.g. 'İ'
# emits "i" + U+0307; NFD input text carries them directly)
_COMBINING = "".join(chr(c) for c in range(0x0300, 0x0370))

_FOLD_FROM = "".join(FOLD_SINGLE) + _COMBINING
_FOLD_TO = "".join(FOLD_SINGLE.values())
_FOLD_TABLE = str.maketrans(
    {**{ord(k): v for k, v in FOLD_SINGLE.items()},
     **{c: None for c in range(0x0300, 0x0370)},
     **{ord(k): v for k, v in FOLD_MULTI}}
)


def fold_token(tok: str) -> str | None:
    """Fold one token to its ASCII form; ``None`` if it folds away
    entirely (e.g. a bare combining mark)."""
    return tok.translate(_FOLD_TABLE) or None


def _fold_col(t: Column) -> Column:
    """The same fold as JVM expressions (whole-stage-codegen-able)."""
    for src, dst in FOLD_MULTI:
        t = F.replace(t, F.lit(src), F.lit(dst))
    return F.translate(t, _FOLD_FROM, _FOLD_TO)


def sql_fold_duckdb(t: str) -> str:
    """DuckDB fragment replaying :func:`fold_token` on expression ``t``."""
    out = t
    for src, dst in FOLD_MULTI:
        out = f"replace({out}, '{src}', '{dst}')"
    frm = _FOLD_FROM.replace("'", "''")
    return f"translate({out}, '{frm}', '{_FOLD_TO}')"


# ---------------------------------------------------------------------------
# CJK bigrams (Lucene CJKAnalyzer semantics): runs of CJK characters
# emit overlapping character bigrams (a length-1 run emits its single
# char); non-CJK segments of a token stay whole tokens. Space-free
# scripts get usable recall without a segmentation model, at ~2 terms
# per character — the classic Lucene trade.
# ---------------------------------------------------------------------------

# Han (+ Ext A), Hiragana, Katakana, Hangul syllables — the ranges
# Lucene's CJKBigramFilter bigrams by default.
_CJK_CLASS = (
    "㐀-䶿"  # CJK Ext A
    "一-鿿"  # CJK Unified
    "぀-ゟ"  # Hiragana
    "゠-ヿ"  # Katakana
    "가-힯"  # Hangul syllables
)
_CJK_ANY = re.compile(f"[{_CJK_CLASS}]")
_CJK_SEG = re.compile(f"([{_CJK_CLASS}]+)")


def cjk_expand(tok: str) -> list[str]:
    """Token -> token list with CJK runs bigrammed; identity list for
    pure non-CJK tokens (callers fast-path those without calling)."""
    out: list[str] = []
    for seg in _CJK_SEG.split(tok):
        if not seg:
            continue
        if _CJK_ANY.match(seg):
            if len(seg) == 1:
                out.append(seg)
            else:
                out.extend(seg[i : i + 2] for i in range(len(seg) - 1))
        else:
            out.append(seg)
    return out


def apply_token_fn(tokens: Iterable[str], fn) -> list[str]:
    """Apply a per-token analysis fn across a stream, splicing list
    returns (CJK expansion) and dropping ``None`` (stopwords / folded-
    away tokens). Multiplicity and order preserved."""
    out: list[str] = []
    for t in tokens:
        a = fn(t)
        if a is None:
            continue
        if isinstance(a, str):
            out.append(a)
        else:
            out.extend(a)
    return out


# ---------------------------------------------------------------------------
# S-stemmer (Harman 1991) — the SQL-expressible stemmer
# ---------------------------------------------------------------------------

def s_stem(token: str) -> str:
    """Harman S-stemmer: three ordered plural-suffix rules.

    1. ``...ies`` -> ``...y``   unless ending ``eies`` / ``aies``
    2. ``...es``  -> ``...e``   unless ending ``aes`` / ``ees`` / ``oes``
    3. ``...s``   -> drop ``s`` unless ending ``us`` / ``ss``

    Applied to tokens of length >= 3 (a 1-2 char token has no plural
    suffix to strip; also keeps ``is``/``as`` intact when stopwords
    are off).
    """
    if len(token) < 3:
        return token
    if token.endswith("ies"):
        if token.endswith(("eies", "aies")):
            return token
        return token[:-3] + "y"
    if token.endswith("es"):
        if token.endswith(("aes", "ees", "oes")):
            return token
        return token[:-1]
    if token.endswith("s") and not token.endswith(("us", "ss")):
        return token[:-1]
    return token


def _s_stem_col(t: Column) -> Column:
    """The same three ordered rules as a Spark CASE expression —
    JVM-side, whole-stage-codegen-able, no Python."""
    ln = F.length(t)
    e = t.endswith  # Column.endswith
    ies = e("ies") & ~e("eies") & ~e("aies")
    es = e("es") & ~e("aes") & ~e("ees") & ~e("oes")
    s = e("s") & ~e("us") & ~e("ss")
    # a GUARDED earlier rule must return unchanged, not fall through
    # to a later rule (elif semantics, matching s_stem) — hence the
    # bare e("ies") / e("es") branches after each guarded one
    return (
        F.when(ln < 3, t)
        .when(ies, F.concat(F.substring(t, 1, ln - 3), F.lit("y")))
        .when(e("ies"), t)
        .when(es, F.substring(t, 1, ln - 1))
        .when(e("es"), t)
        .when(s, F.substring(t, 1, ln - 1))
        .otherwise(t)
    )


def sql_s_stem_duckdb(t: str) -> str:
    """DuckDB CASE replaying :func:`s_stem` on expression ``t``."""
    return f"""CASE
        WHEN length({t}) < 3 THEN {t}
        WHEN {t} LIKE '%ies' AND {t} NOT LIKE '%eies' AND {t} NOT LIKE '%aies'
            THEN substr({t}, 1, length({t}) - 3) || 'y'
        WHEN {t} LIKE '%ies' THEN {t}
        WHEN {t} LIKE '%es' AND {t} NOT LIKE '%aes' AND {t} NOT LIKE '%ees' AND {t} NOT LIKE '%oes'
            THEN substr({t}, 1, length({t}) - 1)
        WHEN {t} LIKE '%es' THEN {t}
        WHEN {t} LIKE '%s' AND {t} NOT LIKE '%us' AND {t} NOT LIKE '%ss'
            THEN substr({t}, 1, length({t}) - 1)
        ELSE {t} END"""


# ---------------------------------------------------------------------------
# Porter stemmer (Porter 1980) — the full classic algorithm
# ---------------------------------------------------------------------------

_VOWELS = frozenset("aeiou")


def _is_consonant(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in Porter's [C](VC)^m[V] decomposition of ``stem``."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_consonant(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    """*o condition: ends consonant-vowel-consonant, final not w/x/y."""
    if len(word) < 3:
        return False
    return (
        _is_consonant(word, len(word) - 3)
        and not _is_consonant(word, len(word) - 2)
        and _is_consonant(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"),
)

_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)

_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def porter_stem(token: str) -> str:  # noqa: C901 — the algorithm IS a rule list
    """The Porter (1980) stemmer, steps 1a-5b, as published.

    Tokens shorter than 3 characters are returned unchanged (Porter's
    own note: words of length 1-2 are left alone). Non-lowercase-ASCII
    input is stemmed as-is — the tokenizer has already lowercased, and
    non-alphabetic tokens simply fail every suffix rule.
    """
    w = token
    if len(w) < 3:
        return w

    # Step 1a — plurals
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b — -ed / -ing
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_consonant(w) and not w.endswith(("l", "s", "z")):
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w += "e"

    # Step 1c — y -> i
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 4 — first matching suffix decides (list is longest-first
    # within each overlap family: ement > ment > ent); -ion has the
    # extra (*S or *T) stem condition and overlaps no list entry, so
    # it lives in the no-match else.
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                w = stem
            break
    else:
        if w.endswith("ion"):
            stem = w[:-3]
            if _measure(stem) > 1 and stem.endswith(("s", "t")):
                w = stem

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # Step 5b
    if _measure(w) > 1 and _ends_double_consonant(w) and w.endswith("l"):
        w = w[:-1]

    return w


def porter_stem_series(s: pd.Series) -> pd.Series:
    """Batch Porter with per-batch unique memoization: stem each
    DISTINCT token once (Zipf: distinct << total per Arrow batch),
    then map back. The scale shape for the pandas-UDF path."""
    uniq = pd.unique(s)
    table = {t: porter_stem(t) for t in uniq}
    return s.map(table)


# ---------------------------------------------------------------------------
# The analyzer: tokenize -> stopword filter -> stem
# ---------------------------------------------------------------------------

def make_token_fn(
    stopwords: Sequence[str] = (),
    stem: str = "none",
    fold: bool = False,
    cjk: bool = False,
) -> Callable[[str], str | list[str] | None] | None:
    """Per-token analysis function, or None when the analyzer is the
    identity — callers skip the loop entirely on unanalyzed indexes,
    keeping the default path zero-cost.

    Return contract: ``None`` drops the token, a ``str`` replaces it,
    a ``list[str]`` splices (CJK bigram expansion — consume through
    :func:`apply_token_fn`). Chain order per non-CJK token/segment:
    fold → stopword filter → stem (folding first so accented surface
    forms hit the ASCII stopword list); CJK bigrams bypass stop+stem
    (a 2-char gram is not an English word)."""
    if stem not in STEM_MODES:
        raise ValueError(f"stem must be one of {STEM_MODES}, got {stem!r}")
    stop = frozenset(stopwords)
    if not stop and stem == "none" and not fold and not cjk:
        return None
    stemmer = {"none": None, "s": s_stem, "porter": porter_stem}[stem]

    def one(tok: str) -> str | None:
        if fold:
            folded = fold_token(tok)
            if folded is None:
                return None
            tok = folded
        if tok in stop:
            return None
        return stemmer(tok) if stemmer else tok

    if not cjk:
        return one

    def fn(tok: str) -> str | list[str] | None:
        if not _CJK_ANY.search(tok):
            return one(tok)  # pure-latin fast path: zero extra work
        out: list[str] = []
        for piece in cjk_expand(tok):
            if _CJK_ANY.match(piece):
                out.append(piece)
            else:
                a = one(piece)
                if a is not None:
                    out.append(a)
        return out or None

    return fn


def analyze_tokens(
    tokens: Iterable[str],
    stopwords: Sequence[str] = (),
    stem: str = "none",
    fold: bool = False,
    cjk: bool = False,
) -> list[str]:
    """Token stream -> analyzed token stream (multiplicity preserved —
    the INDEX side; query-side dedup happens in parse_query)."""
    fn = make_token_fn(stopwords, stem, fold, cjk)
    if fn is None:
        return list(tokens)
    return apply_token_fn(tokens, fn)


def analyze(
    text: str | None,
    stopwords: Sequence[str] = (),
    stem: str = "none",
    fold: bool = False,
    cjk: bool = False,
) -> list[str]:
    """text -> analyzed tokens (the pure-Python oracle/query path)."""
    return analyze_tokens(tokenize(text), stopwords, stem, fold, cjk)


def analyze_tokens_col(
    arr: Column,
    stopwords: Sequence[str] = (),
    stem: str = "none",
    fold: bool = False,
) -> Column:
    """array<string> tokens -> analyzed array<string>, JVM-side for
    stem in ("none", "s") + optional fold. ``stem="porter"`` and CJK
    bigrams are not expressible as a Column — use
    :func:`analyzed_text_col`, which routes them through the Arrow
    pandas UDF."""
    if stem not in ("none", "s"):
        raise ValueError(
            f"analyze_tokens_col handles stem none|s; {stem!r} needs the "
            "pandas-UDF path (analyzed_text_col)"
        )
    out = arr
    if fold:
        out = F.filter(F.transform(out, _fold_col), lambda t: t != "")
    if stopwords:
        stop_arr = F.array(*[F.lit(s) for s in sorted(set(stopwords))])
        out = F.filter(out, lambda t: ~F.array_contains(stop_arr, t))
    if stem == "s":
        out = F.transform(out, _s_stem_col)
    return out


def analyzed_text_col(
    text: Column,
    stopwords: Sequence[str] = (),
    stem: str = "none",
    fold: bool = False,
    cjk: bool = False,
) -> Column:
    """text column -> analyzed text column (tokens re-joined by one
    space). The index build's pre-pass: the rewritten text tokenizes
    back to exactly the analyzed token stream (round-trip property —
    see module docstring; folds/bigrams contain no whitespace or
    ``[.,!?]``), so every downstream tokenize pass (JVM or Arrow)
    indexes analyzed terms without modification.

    ``stem in ("none", "s")`` (+ fold): pure JVM expressions, fused
    into the scan. ``stem="porter"`` or ``cjk=True``: an Arrow-batched
    pandas UDF with unique-token memoization (the genuinely
    rule-procedural steps; Zipf makes distinct << total per batch).
    """
    if stem == "porter" or cjk:
        fn = make_token_fn(stopwords, stem, fold, cjk)

        @F.pandas_udf("string")
        def _analyzed_text(s: pd.Series) -> pd.Series:
            table: dict[str, str | list[str] | None] = {}

            def one(txt):
                out: list[str] = []
                for t in tokenize(txt):
                    if t not in table:
                        table[t] = fn(t)
                    a = table[t]
                    if a is None:
                        continue
                    if isinstance(a, str):
                        out.append(a)
                    else:
                        out.extend(a)
                return " ".join(out)

            return s.map(one, na_action=None).fillna("")

        return _analyzed_text(text)
    return F.array_join(
        analyze_tokens_col(tokens_col(text), stopwords, stem, fold), " "
    )


def sql_analyze_duckdb(
    toks_expr: str,
    stopwords: Sequence[str] = (),
    stem: str = "none",
    fold: bool = False,
) -> str:
    """DuckDB fragment: list expression ``toks_expr`` (tokens) ->
    analyzed list, replaying fold + stopword filter + S-stem
    byte-identically (the oracle side of the parity contract; porter
    and CJK have no offline DuckDB replay)."""
    if stem not in ("none", "s"):
        raise ValueError(f"no DuckDB replay for stem={stem!r}")
    out = toks_expr
    if fold:
        out = (
            f"list_filter(list_transform({out}, "
            f"t -> ({sql_fold_duckdb('t')})), t -> t <> '')"
        )
    if stopwords:
        lits = ", ".join(f"'{s}'" for s in sorted(set(stopwords)))
        out = f"list_filter({out}, t -> t NOT IN ({lits}))"
    if stem == "s":
        out = f"list_transform({out}, t -> ({sql_s_stem_duckdb('t')}))"
    return out
