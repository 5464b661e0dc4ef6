"""Text analysis for training-data pipelines (task mandate): language ID,
quality scoring, token counting, document fingerprinting.

All pure DataFrame expressions on portable primitives → every function
here has a DuckDB oracle in ``__spark_entry__``. The reference's
analogue is the ``language_iso`` column it carries around
(/root/reference/src/tests/test_app.py:123,185) — detection itself lived
outside; at 100 TB it must be in-engine and JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# per-language stopword marker sets (n-gram heuristic; deterministic).
# ASCII-only so lowercasing/replace semantics are identical across
# engines; __spark_entry__ derives its DuckDB oracle from THIS dict, so
# the two can never drift.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " is ", " that ",
           " with ", " for ", " this ", " are ", " have "],
    "fr": [" le ", " la ", " les ", " et ", " est ",
           " des ", " dans ", " pour ", " qui ", " pas "],
    "es": [" el ", " los ", " que ", " es ", " una ",
           " las ", " por ", " con ", " para ", " del "],
    "de": [" der ", " die ", " und ", " ist ", " das ",
           " nicht ", " mit ", " ein ", " auf ", " von "],
    "pt": [" o ", " os ", " que ", " uma ", " com ",
           " para ", " dos ", " em ", " se ", " mais "],
    "it": [" il ", " di ", " che ", " per ", " sono ",
           " del ", " non ", " alla ", " anche ", " come "],
    "nl": [" de ", " het ", " een ", " van ", " en ",
           " dat ", " op ", " te ", " voor ", " zijn "],
    "sv": [" och ", " att ", " det ", " som ", " av ",
           " med ", " den ", " inte ", " har ", " om "],
    "id": [" yang ", " dan ", " di ", " ini ", " itu ",
           " dengan ", " untuk ", " pada ", " adalah ", " dari "],
    "tr": [" bir ", " ve ", " bu ", " ile ", " olarak ",
           " gibi ", " daha ", " sonra ", " kadar ", " ama "],
}


def _count_occurrences(text: Column, marker: str) -> Column:
    """Occurrences of marker via length arithmetic (portable SQL idiom)."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit("")))
    ) / len(marker)


def lang_score_columns(text_col: str = "text") -> list[Column]:
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    cols = []
    for lang, markers in _LANG_MARKERS.items():
        score = sum(_count_occurrences(padded, m) for m in markers)
        cols.append(score.alias(f"score_{lang}"))
    return cols


def detect_language(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID → (id, detected_lang, lang_confidence)."""
    scored = df.select(F.col(id_col).alias("id"), *lang_score_columns(text_col))
    langs = list(_LANG_MARKERS)
    # argmax over the score columns; deterministic tie-break = langs order
    pairs = F.array(
        *[F.struct(F.col(f"score_{l}").alias("s"), F.lit(i).alias("i")) for i, l in enumerate(langs)]
    )
    best = F.array_max(
        F.transform(pairs, lambda p: F.struct(p["s"].alias("s"), (-p["i"]).alias("ni")))
    )
    total = sum(F.col(f"score_{l}") for l in langs)
    lang_name = F.element_at(
        F.array(*[F.lit(l) for l in langs]), (-best["ni"]).cast("int") + 1
    )
    return scored.select(
        "id",
        F.when(best["s"] > 0, lang_name).otherwise(F.lit("und")).alias("detected_lang"),
        F.round(
            F.when(total > 0, best["s"] / total).otherwise(F.lit(0.0)), 6
        ).alias("lang_confidence"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score ∈ [0,1].

    Signals: length band, alpha ratio, digit ratio, mean word length —
    the usual web-corpus filters (C4-style) as pure expressions.
    """
    t = F.col(text_col)
    n = F.greatest(F.length(t), F.lit(1)).cast("double")
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", "")) / n
    digits = F.length(F.regexp_replace(t, r"[^0-9]", "")) / n
    spaces = F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))
    n_words = (spaces + 1).cast("double")
    mean_word_len = n / n_words
    len_ok = (F.length(t) >= 50) & (F.length(t) <= 100000)
    word_ok = (mean_word_len >= 3.0) & (mean_word_len <= 12.0)
    score = (
        F.when(len_ok, 0.4).otherwise(0.0)
        + F.when(word_ok, 0.3).otherwise(0.0)
        + F.when(alpha >= 0.6, 0.2).otherwise(0.0)
        + F.when(digits <= 0.2, 0.1).otherwise(0.0)
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.length(t).alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.round(alpha, 6).alias("alpha_ratio"),
        F.round(digits, 6).alias("digit_ratio"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(score, 6).alias("quality"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (len/4 heuristic +
    punctuation splits) — the budgeting numbers a training pipeline needs."""
    t = F.col(text_col)
    ws_tokens = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != ""))
    punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    bpe_est = F.ceil(F.length(F.regexp_replace(t, r"\s+", "")) / 4.0) + punct
    return df.select(
        F.col(id_col).alias("id"),
        ws_tokens.cast("long").alias("ws_tokens"),
        bpe_est.cast("long").alias("bpe_tokens_est"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Stable document fingerprint: md5 of the normalized text plus a
    64-bit prefix as a join-friendly integer."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    h = F.md5(norm)
    return df.select(
        F.col(id_col).alias("id"),
        h.alias("fp_md5"),
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long").alias("fp_int"),
    )
