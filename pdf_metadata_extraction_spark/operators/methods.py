"""Text-to-text method suite + performance argmax (SURVEY.md §2.7 X2, §2.4 A2).

Reference analogue: the extractor method families enumerated by
``get_jobs`` and scored by ``get_performance`` per candidate method, with
the best method selected by argmax (fan-out at
/root/reference/src/use_cases/GetPerformanceJobUseCase.py:43-54, scoring
at src/drivers/distributed_worker/distributed_flow.py:81-100). Pinned
behaviors:
- pattern induction: trained on ('Option 1'→'1', 'Option 2'→'2'),
  predicts 'Option 3'→'3' (src/tests/test_end_to_end.py:400-485);
- empty training set → error string
  ``"No valid performance results to select the best model"``
  (src/tests/test_end_to_end.py:72);
- the extracted span is highlighted in the source text
  (``ix_matching_paragraph``/``ix_match`` markup, test :474-485).

Spark shape: training sets are tiny per extraction (the reference's
whole design assumes this) → methods fit **on the driver**; the selected
method's state is broadcast and applied in one vectorized ``mapInPandas``
pass over predictions (J5 — broadcast-model join).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from pdf_metadata_extraction_spark.operators.extract import normalize_ws
from pdf_metadata_extraction_spark.operators.linking import highlight, plain_paragraph

NO_VALID_RESULTS = "No valid performance results to select the best model"

_NUM_RE = re.compile(r"\d+(?:[.,]\d+)?")
_DATE_RES = [
    (re.compile(r"(\d{4})-(\d{2})-(\d{2})"), lambda m: f"{m[1]}-{m[2]}-{m[3]}"),
    (
        re.compile(
            r"(\d{1,2})\s+(January|February|March|April|May|June|July|August|"
            r"September|October|November|December)\s+(\d{4})",
            re.IGNORECASE,
        ),
        None,  # filled below
    ),
]
_MONTHS = {
    m: i + 1
    for i, m in enumerate(
        "january february march april may june july august september october november december".split()
    )
}


# ------------------------------------------------------------ methods
def _norm_series(s: pd.Series) -> pd.Series:
    """Vectorized normalize_ws (pandas ``.str`` ops, C speed)."""
    return s.fillna("").str.replace(r"\s+", " ", regex=True).str.strip()


def _na_to_none(s: pd.Series) -> pd.Series:
    """pandas extract/map emit NaN for misses; the predict() spec says
    None — keep the two paths indistinguishable."""
    return s.astype(object).where(s.notna(), None)


class Method:
    name: str

    def fit(self, pairs: list[tuple[str, str]]) -> bool:
        """Learn from (source_text, label_text). Return False if not applicable."""
        return True

    def predict(self, text: str) -> str | None:
        raise NotImplementedError

    def predict_series(self, texts: pd.Series,
                       normalized: bool = False) -> pd.Series:
        """Vectorized predict over a pandas Series. MUST equal
        element-wise ``predict`` (the spec; property-tested in
        tests/test_properties.py) — subclasses override with
        ``Series.str`` ops so the regex work runs in C, the per-row
        fallback here is only for methods with no vector form.

        ``normalized=True`` promises the input is already
        whitespace-normalized (normalize_ws is idempotent, so this is
        purely a speed contract): overrides skip their internal
        re-normalization pass — apply_method normalizes each batch
        once and must not pay the whitespace scan twice."""
        return _na_to_none(texts.map(lambda t: self.predict(t)))

    def state(self) -> dict:
        return {}

    @classmethod
    def from_state(cls, state: dict) -> "Method":
        obj = cls()
        obj.__dict__.update(state)
        return obj


class IdentityMethod(Method):
    name = "identity"

    def predict(self, text: str) -> str | None:
        return normalize_ws(text)

    def predict_series(self, texts: pd.Series,
                       normalized: bool = False) -> pd.Series:
        return texts.fillna("") if normalized else _norm_series(texts)


class AffixMethod(Method):
    """Induce a common prefix/suffix context around the labeled span.

    ('Option 1'→'1','Option 2'→'2') ⇒ prefix='Option ', suffix='' ⇒
    'Option 3'→'3'.
    """

    name = "affix"

    def __init__(self) -> None:
        self.prefix = ""
        self.suffix = ""

    def fit(self, pairs: list[tuple[str, str]]) -> bool:
        prefixes, suffixes = [], []
        for src, label in pairs:
            src_n, label_n = normalize_ws(src), normalize_ws(label)
            pos = src_n.find(label_n)
            if pos < 0 or not label_n:
                return False
            prefixes.append(src_n[:pos])
            suffixes.append(src_n[pos + len(label_n):])
        self.prefix = _common_suffix_of(prefixes)
        self.suffix = _common_prefix_of(suffixes)
        return True

    def _pattern(self) -> str:
        return (
            re.escape(self.prefix) + r"(.+?)" + re.escape(self.suffix)
            + ("$" if not self.suffix else "")
        )

    def predict(self, text: str) -> str | None:
        m = re.search(self._pattern(), normalize_ws(text))
        return m.group(1) if m else None

    def predict_series(self, texts: pd.Series,
                       normalized: bool = False) -> pd.Series:
        # str.extract = re.search + group capture, vectorized in C;
        # escaped prefix/suffix contain no groups, so group 1 is (.+?)
        t = texts.fillna("") if normalized else _norm_series(texts)
        return _na_to_none(t.str.extract(self._pattern(), expand=False))

    def state(self) -> dict:
        return {"prefix": self.prefix, "suffix": self.suffix}


class RegexShapeMethod(Method):
    """Induce a character-class shape regex from the labels (the
    reference's method suite carries regex methods alongside the affix
    family). All labels must share the same class-run sequence
    (e.g. 'A7', 'B9' → ``[A-Z]\\d``; '2021', '19' → ``\\d{2,4}``);
    prediction = first shape match in the text. Generalizes where affix
    fails (varying context around a fixed-shape value)."""

    name = "regex_shape"

    def __init__(self) -> None:
        self.pattern = ""

    @staticmethod
    def _runs(label: str) -> list[tuple[str, int]]:
        runs: list[tuple[str, int]] = []
        for ch in label:
            if ch.isdigit():
                cls = r"\d"
            elif "A" <= ch <= "Z":
                cls = "[A-Z]"
            elif "a" <= ch <= "z":
                cls = "[a-z]"
            else:
                cls = re.escape(ch)
            if runs and runs[-1][0] == cls:
                runs[-1] = (cls, runs[-1][1] + 1)
            else:
                runs.append((cls, 1))
        return runs

    def fit(self, pairs: list[tuple[str, str]]) -> bool:
        sigs = []
        for src, label in pairs:
            label_n = normalize_ws(label)
            if not label_n or label_n not in normalize_ws(src):
                return False
            sigs.append(self._runs(label_n))
        if len({tuple(c for c, _ in s) for s in sigs}) != 1:
            return False
        parts = []
        for i, (cls, _n) in enumerate(sigs[0]):
            lo = min(s[i][1] for s in sigs)
            hi = max(s[i][1] for s in sigs)
            if cls not in (r"\d", "[A-Z]", "[a-z]"):
                parts.append(cls * lo)  # literal runs: exact repeat
                continue
            quant = f"{{{lo}}}" if lo == hi else f"{{{lo},{hi}}}"
            parts.append(cls + quant)
        self.pattern = "".join(parts)
        return bool(self.pattern)

    def predict(self, text: str) -> str | None:
        if not self.pattern:
            return None
        m = re.search(self.pattern, normalize_ws(text or ""))
        return m.group(0) if m else None

    def predict_series(self, texts: pd.Series,
                       normalized: bool = False) -> pd.Series:
        if not self.pattern:
            return pd.Series([None] * len(texts), index=texts.index, dtype=object)
        # the induced pattern has no groups (classes + escaped literals),
        # so wrapping it makes group 1 == group 0 of the spec
        t = texts.fillna("") if normalized else _norm_series(texts)
        return _na_to_none(t.str.extract(f"({self.pattern})", expand=False))

    def state(self) -> dict:
        return {"pattern": self.pattern}


class FirstNumberMethod(Method):
    name = "first_number"

    def predict(self, text: str) -> str | None:
        m = _NUM_RE.search(text or "")
        return m.group(0) if m else None

    def predict_series(self, texts: pd.Series,
                       normalized: bool = False) -> pd.Series:
        return _na_to_none(
            texts.fillna("").str.extract(f"({_NUM_RE.pattern})", expand=False)
        )


class LastTokenMethod(Method):
    name = "last_token"

    def predict(self, text: str) -> str | None:
        toks = normalize_ws(text or "").split(" ")
        return toks[-1] if toks and toks[-1] else None

    def predict_series(self, texts: pd.Series,
                       normalized: bool = False) -> pd.Series:
        # normalized text is single-spaced and stripped: the last token
        # is the trailing run of non-spaces (empty text -> no match)
        t = texts.fillna("") if normalized else _norm_series(texts)
        return _na_to_none(t.str.extract(r"([^ ]+)$", expand=False))


class DateIsoMethod(Method):
    """Locale-light date normalization: '15 February 2021' → '2021-02-15'."""

    name = "date_iso"

    def predict(self, text: str) -> str | None:
        t = text or ""
        m = _DATE_RES[0][0].search(t)
        if m:
            return m.group(0)
        m = _DATE_RES[1][0].search(t)
        if m:
            month = _MONTHS[m.group(2).lower()]
            return f"{m.group(3)}-{month:02d}-{int(m.group(1)):02d}"
        return None

    def predict_series(self, texts: pd.Series,
                       normalized: bool = False) -> pd.Series:
        raw = texts.fillna("")
        # both regex passes vectorize; only the day/month zero-padding
        # on the (few) matching rows stays per-row
        e0 = raw.str.extract(_DATE_RES[0][0])
        iso = e0[0] + "-" + e0[1] + "-" + e0[2]
        e1 = raw.str.extract(_DATE_RES[1][0])
        long = pd.Series(
            [
                None if pd.isna(d)
                else f"{y}-{_MONTHS[mo.lower()]:02d}-{int(d):02d}"
                for d, mo, y in zip(e1[0], e1[1], e1[2])
            ],
            index=raw.index, dtype=object,
        )
        return _na_to_none(iso.astype(object).where(iso.notna(), long))


class LookupMethod(Method):
    """Memorizing fallback — the reference's non-extractive semantic
    methods can emit outputs not present in the input (GPU golden test,
    src/tests/test_end_to_end.py:554-628 'output_not_in_input'); the
    degenerate-but-faithful CPU analogue is an exact input→label lookup
    learned from the training pairs."""

    name = "lookup"

    def __init__(self) -> None:
        self.table: dict[str, str] = {}

    def fit(self, pairs: list[tuple[str, str]]) -> bool:
        self.table = {normalize_ws(s): normalize_ws(l) for s, l in pairs}
        return True

    def predict(self, text: str) -> str | None:
        return self.table.get(normalize_ws(text))

    def predict_series(self, texts: pd.Series,
                       normalized: bool = False) -> pd.Series:
        t = texts.fillna("") if normalized else _norm_series(texts)
        return _na_to_none(t.map(self.table))

    def state(self) -> dict:
        return {"table": self.table}


METHOD_ORDER: list[type[Method]] = [
    IdentityMethod,
    AffixMethod,
    DateIsoMethod,
    RegexShapeMethod,
    FirstNumberMethod,
    LastTokenMethod,
    LookupMethod,
]
_METHODS_BY_NAME = {m.name: m for m in METHOD_ORDER}


def _common_prefix_of(strings: list[str]) -> str:
    if not strings:
        return ""
    s0 = min(strings, key=len)
    for i, ch in enumerate(s0):
        if any(s[i] != ch for s in strings):
            return s0[:i]
    return s0


def _common_suffix_of(strings: list[str]) -> str:
    return _common_prefix_of([s[::-1] for s in strings])[::-1]


# ------------------------------------------------------------ A2 argmax
def select_best_method(pairs: list[tuple[str, str]]) -> tuple[str, dict, float]:
    """Score every candidate method on HELD-OUT pairs, argmax accuracy.

    Reference semantics: each method's performance is measured on samples
    it was not trained on (/root/reference/src/use_cases/
    GetPerformanceJobUseCase.py:43-54, distributed_flow.py:81-100) —
    resubstitution would let a memorizing method (LookupMethod) always
    score 1.0 and shadow generalizing methods. Training sets are tiny by
    the reference's design, so we use leave-one-out: fit on pairs \\ {i},
    predict pair i, accuracy = hits/n. A single pair can't be held out →
    resubstitution for n == 1 (tie-breaks still favor earlier, simpler
    methods). The returned state is fit on the FULL set.

    Deterministic tie-break: METHOD_ORDER position. Empty/invalid input →
    ValueError with the reference's exact pinned message.
    """
    pairs = [(s, l) for s, l in pairs if s is not None and l is not None]
    results = []
    for rank, cls in enumerate(METHOD_ORDER):
        method = cls()
        if not pairs or not method.fit(pairs):
            continue
        hits = 0
        if len(pairs) == 1:
            src, label = pairs[0]
            hits = int((method.predict(src) or "") == normalize_ws(label))
        else:
            for i, (src, label) in enumerate(pairs):
                fold = cls()
                train = pairs[:i] + pairs[i + 1:]
                if not fold.fit(train):
                    hits = -1  # method not applicable on some fold
                    break
                hits += int((fold.predict(src) or "") == normalize_ws(label))
        if hits < 0:
            continue
        acc = hits / len(pairs)
        results.append((acc, -rank, method))
    if not results:
        raise ValueError(NO_VALID_RESULTS)
    acc, _negrank, best = max(results, key=lambda r: (r[0], r[1]))
    return best.name, best.state(), acc


# ------------------------------------------------------------ J5 apply
def apply_method(
    predictions: DataFrame,
    method_name: str,
    method_state: dict,
    text_col: str = "source_text",
) -> DataFrame:
    """Broadcast the fitted method; vectorized apply over predictions.

    Adds ``text`` (the extraction) and ``segment_text`` (ix_match-
    highlighted source paragraph; plain paragraph when non-extractive).
    """
    spark = predictions.sparkSession
    bc = spark.sparkContext.broadcast((method_name, method_state))
    cols = [f.name for f in predictions.schema.fields]
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(predictions.schema.fields)
        + [T.StructField("text", T.StringType()), T.StructField("segment_text", T.StringType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        name, state = bc.value
        method = _METHODS_BY_NAME[name].from_state(state)
        for pdf in batches:
            # the regex/lookup work runs vectorized (predict_series ==
            # per-row predict, property-tested); only the highlight
            # assembly on the result stays per-row (plain string concat)
            norm = _norm_series(pdf[text_col])
            outs = method.predict_series(norm, normalized=True)
            texts, seg_texts = [], []
            for src_n, out in zip(norm.values, outs.values):
                out = out or ""
                texts.append(out)
                pos = src_n.find(out) if out else -1
                if out and pos >= 0:
                    seg_texts.append(highlight(src_n, pos, pos + len(out)))
                else:
                    seg_texts.append(plain_paragraph(src_n))
            pdf = pdf[cols].copy()
            pdf["text"] = texts
            pdf["segment_text"] = seg_texts
            yield pdf

    return predictions.mapInPandas(run, schema=out_schema)
