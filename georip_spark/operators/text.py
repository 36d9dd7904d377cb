"""Text-analysis operators for training-data pipelines: language-ID
heuristic, quality scoring, token counting, rolling-hash document
fingerprinting. All pure Catalyst column math — these run in the scan
stage at 10^12-doc scale with zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny stopword lists per language for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " is "],
    "fr": [" le ", " la ", " et ", " est "],
    "es": [" el ", " de ", " que ", " es "],
    "de": [" der ", " und ", " die ", " ist "],
    "zh": ["的", "是", "了", "在"],
}


def count_occurrences(text: Column, needle: str) -> Column:
    """Occurrence count via length difference — engine-portable
    (replace() semantics are identical across engines, unlike regex
    dialects)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def lang_scores(text: Column) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    return {
        lang: sum(
            (count_occurrences(padded, m) for m in markers),
            F.lit(0).cast("long"),
        )
        for lang, markers in LANG_MARKERS.items()
    }


def predict_lang(text: Column) -> Column:
    """argmax language by marker hits, deterministic tie-break by
    language code order; no hits → 'und'."""
    scores = lang_scores(text)
    best_lang = F.lit("und")
    best_score = F.lit(0).cast("long")
    for lang in sorted(scores):  # later wins only on strictly greater
        s = scores[lang]
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def token_count(text: Column) -> Column:
    """Whitespace token count (empty tokens from runs excluded)."""
    return F.size(F.filter(F.split(text, " "), lambda t: F.length(t) > 0)).cast("long")


def word_token_count(text: Column) -> Column:
    """BPE-ish token estimate: word-piece count where every run of
    ≤4 chars is one piece — ceil(len(word)/4) summed over words."""
    words = F.filter(F.split(text, " "), lambda t: F.length(t) > 0)
    return F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("long"),
    )


def punct_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, "[^.,!?;:]", "")).cast("long")


def quality_score(text: Column) -> Column:
    """Simple quality heuristic in [0,1]: penalize very short docs,
    high punctuation density and low alpha ratio. Deterministic
    arithmetic only (round 6)."""
    n = F.length(text).cast("double")
    alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", "")).cast("double")
    punct = punct_count(text).cast("double")
    len_score = F.least(n / F.lit(200.0), F.lit(1.0))
    alpha_ratio = alpha / F.greatest(n, F.lit(1.0))
    punct_penalty = F.least(punct / F.greatest(n, F.lit(1.0)) * 10.0, F.lit(1.0))
    return F.round(len_score * alpha_ratio * (F.lit(1.0) - punct_penalty * 0.5), 6)


def rolling_fingerprint(text: Column, window: int = 16) -> Column:
    """Document fingerprint: min of rolling polynomial hashes over
    fixed windows (winnowing-lite) — stable under small appends, used
    for cheap near-dup bucketing."""
    starts = F.sequence(
        F.lit(0), F.greatest(F.length(text) - window, F.lit(0)), F.lit(window // 2)
    )

    def code(i: Column) -> Column:
        total = F.lit(0).cast("long")
        for j in range(8):  # sample 8 chars of the window (stride 2)
            total = total + F.ascii(F.substring(text, i + 1 + 2 * j, 1)).cast("long") * F.lit(31 ** j)
        return total % F.lit(2147483647)

    return F.array_min(F.transform(starts, code))
