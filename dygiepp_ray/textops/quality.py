"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting — all vectorized ``map_batches`` over the
``documents`` table shape (doc_id, text, ...).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data

STOPWORDS = ("a", "and", "of", "the", "to")

_MOD = (1 << 61) - 1
_BASE = 1_000_003


def token_counts(ds: ray.data.Dataset, text_col="text", id_col="doc_id") -> ray.data.Dataset:
    """(doc_id, n_tokens) — whitespace tokenization."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        n = df[text_col].str.strip().str.split(r"\s+", regex=True).map(len)
        empty = df[text_col].str.strip() == ""
        n = n.where(~empty, 0)
        return pd.DataFrame(
            {"doc_id": df[id_col].to_numpy(), "n_tokens": n.to_numpy().astype(np.int64)}
        )

    return ds.map_batches(fn, batch_format="pandas")


def quality_scores(
    ds: ray.data.Dataset, text_col="text", id_col="doc_id",
    keep_cols: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """(doc_id, n_tokens, n_stopwords, n_distinct, mean_token_len_x100)

    All integer-valued (mean scaled x100 and floored) so the DuckDB
    oracle hashes identically — no float drift.  ``keep_cols`` are
    copied through unchanged (e.g. ``source`` for downstream grouping).
    """

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].str.strip().str.split(r"\s+", regex=True)
        toks = toks.map(lambda t: [] if t == [""] else t)
        n = toks.map(len).to_numpy().astype(np.int64)
        stop = set(STOPWORDS)
        n_stop = toks.map(lambda t: sum(w in stop for w in t)).to_numpy().astype(np.int64)
        n_dist = toks.map(lambda t: len(set(t))).to_numpy().astype(np.int64)
        tot_len = toks.map(lambda t: sum(len(w) for w in t)).to_numpy().astype(np.int64)
        mean100 = np.where(n > 0, (tot_len * 100) // np.maximum(n, 1), 0)
        cols = {
            "doc_id": df[id_col].to_numpy(),
            "n_tokens": n,
            "n_stopwords": n_stop,
            "n_distinct": n_dist,
            "mean_token_len_x100": mean100.astype(np.int64),
        }
        for c in keep_cols:
            cols[c] = df[c].to_numpy()
        return pd.DataFrame(cols)

    return ds.map_batches(fn, batch_format="pandas")


def word_entropy(
    ds: ray.data.Dataset, text_col="text", id_col="doc_id"
) -> ray.data.Dataset:
    """(doc_id, n_tokens, n_distinct, word_entropy) — per-document
    Shannon entropy of the word-unigram distribution (nats, round 6),
    the classic repetitiveness/quality signal (low entropy = boilerplate
    or keyword stuffing; CCNet/Gopher-style filters threshold on it).

    Map-only (documents are independent): vectorized explode + groupby
    per batch, H = ln(n) - sum(c*ln(c))/n from exact integer counts, so
    both engines feed ln() identical integers; empty documents score
    0.0 by convention (matches the oracle's COALESCE)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame(
            {"doc_id": pd.Series(dtype=np.int64),
             "n_tokens": pd.Series(dtype=np.int64),
             "n_distinct": pd.Series(dtype=np.int64),
             "word_entropy": pd.Series(dtype=np.float64)})
        if len(df) == 0 or text_col not in df.columns:
            return out_empty
        toks = df[text_col].str.strip().str.split(r"\s+", regex=True)
        toks = toks.map(lambda t: [] if t == [""] else t)
        ids = df[id_col].to_numpy(np.int64)
        e = pd.DataFrame(
            {"doc_id": np.repeat(ids, toks.map(len).to_numpy(np.int64)),
             "tok": np.concatenate(
                 [np.asarray(t, dtype=object) for t in toks]
             ) if len(df) else np.empty(0, object)})
        c = e.groupby(["doc_id", "tok"], as_index=False).size()
        cv = c["size"].to_numpy(np.float64)
        c["cln"] = cv * np.log(cv)
        a = c.groupby("doc_id", as_index=False).agg(
            n_tokens=("size", "sum"), n_distinct=("size", "size"),
            s=("cln", "sum"))
        nv = a["n_tokens"].to_numpy(np.float64)
        a["word_entropy"] = (np.log(nv) - a["s"].to_numpy() / nv).round(6)
        full = pd.DataFrame({"doc_id": ids}).merge(
            a.drop(columns="s"), on="doc_id", how="left")
        full["n_tokens"] = full["n_tokens"].fillna(0).astype(np.int64)
        full["n_distinct"] = full["n_distinct"].fillna(0).astype(np.int64)
        full["word_entropy"] = full["word_entropy"].fillna(0.0)
        return full

    return ds.map_batches(fn, batch_format="pandas")


# GPT-2-style pre-tokenizer regex, restricted to constructs with identical
# semantics in Python re and RE2 (no lookahead, no \p classes) so the
# DuckDB oracle reproduces it exactly.
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9' ]+"


class BpeTokenCounter:
    """Actor-pool stage: BPE-ish pre-tokenizer compiled once per actor;
    counts sub-word-ish tokens per document (contractions split,
    letter/digit/punct runs separated — the usual LLM token-budget
    estimator shape)."""

    def __init__(self, pattern: str = BPE_PATTERN):
        import re as _re

        self.pat = _re.compile(pattern)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = df["text"].map(lambda t: len(self.pat.findall(t)))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_bpe_tokens": n.to_numpy().astype(np.int64),
            }
        )


def bpe_token_counts(
    ds: ray.data.Dataset, concurrency: int | None = None
) -> ray.data.Dataset:
    if concurrency:
        return ds.map_batches(
            BpeTokenCounter, batch_format="pandas", concurrency=concurrency
        )
    return ds.map_batches(BpeTokenCounter(), batch_format="pandas")


# language-ID: character n-gram profile heuristic (no external models).
_LANG_PROFILES = {
    "en": ("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"),
    "es": ("de", "la", "os", "ar", "es", "el", "en", "ue", "ción", "ll"),
    "de": ("en", "er", "ch", "de", "ei", "ie", "sch", "un", "ge", "ß"),
    "fr": ("le", "es", "de", "en", "on", "nt", "qu", "la", "ou", "é"),
    "zh": tuple(),  # CJK handled by codepoint-range rule below
}


class LangId:
    """Actor-pool stage: n-gram profiles compiled once per actor.

    Heuristic: CJK codepoint ratio > 0.2 -> zh; otherwise the latin
    profile with the highest bigram-hit density; ties resolve
    alphabetically.  Deterministic, model-free.
    """

    def __init__(self):
        self.profiles = {
            lang: tuple(grams) for lang, grams in _LANG_PROFILES.items() if grams
        }

    def classify(self, text: str) -> str:
        if not text:
            return "und"
        n_cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
        if n_cjk / max(1, len(text)) > 0.2:
            return "zh"
        low = text.lower()
        best_lang, best_score = "und", 0.0
        for lang in sorted(self.profiles):
            score = sum(low.count(g) for g in self.profiles[lang]) / max(1, len(low))
            if score > best_score:
                best_lang, best_score = lang, score
        return best_lang

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "lang_pred": [self.classify(t) for t in df["text"]],
            }
        )


def lang_id(ds: ray.data.Dataset, concurrency: int | None = None) -> ray.data.Dataset:
    if concurrency:
        return ds.map_batches(LangId, batch_format="pandas", concurrency=concurrency)
    return ds.map_batches(LangId(), batch_format="pandas")


DENY_TERMS = ("drop table", "lorem ipsum", "click here")


def content_flags(
    ds: ray.data.Dataset, terms: tuple[str, ...] = DENY_TERMS,
    text_col="text", id_col="doc_id",
) -> ray.data.Dataset:
    """(doc_id, flagged): denylist content filter — flagged=1 iff the
    text contains any deny term (plain substring, vectorized
    ``str.contains``).  The moderation/PII-filter shape of a curation
    pipeline; swap the term list for compiled regexes in an actor pool
    when patterns are heavy."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        hit = np.zeros(len(df), dtype=bool)
        for t in terms:
            hit |= df[text_col].str.contains(t, regex=False).to_numpy()
        return pd.DataFrame(
            {"doc_id": df[id_col].to_numpy(), "flagged": hit.astype(np.int64)}
        )

    return ds.map_batches(fn, batch_format="pandas")


class Redactor:
    """Actor-pool stage: the alternation regex over the deny terms is
    compiled ONCE per actor (the PII-scrub shape — swap the term list
    for heavy PII patterns and raise concurrency).  Each batch is two
    vectorized str ops (count + replace)."""

    def __init__(self, terms: tuple[str, ...] = DENY_TERMS,
                 replacement: str = "[REDACTED]",
                 text_col: str = "text", id_col: str = "doc_id"):
        import re

        self.pat = re.compile("|".join(re.escape(t) for t in terms))
        self.replacement = replacement
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        s = df[self.text_col].fillna("")
        n = s.str.count(self.pat).astype(np.int64)
        clean = s.str.replace(self.pat, self.replacement, regex=True)
        return pd.DataFrame(
            {
                self.id_col: df[self.id_col].to_numpy(),
                "n_redactions": n.to_numpy(np.int64),
                "clean_len": clean.str.len().to_numpy(np.int64),
            }
        )


def redact_terms(
    ds: ray.data.Dataset, terms: tuple[str, ...] = DENY_TERMS,
    replacement: str = "[REDACTED]",
    text_col: str = "text", id_col: str = "doc_id",
    concurrency: int | None = 2,
) -> ray.data.Dataset:
    """(doc_id, n_redactions, clean_len): deny-term redaction — the
    content-REWRITE member of the moderation family (content_flags only
    flags).  Non-overlapping left-to-right replacement, the same
    convention as SQL ``regexp_replace(..., 'g')``, so the twin hashes
    exactly.  Embarrassingly parallel; regex compiled per actor."""
    if concurrency:
        return ds.map_batches(
            Redactor,
            fn_constructor_args=(terms, replacement, text_col, id_col),
            batch_format="pandas", concurrency=concurrency,
        )
    return ds.map_batches(
        Redactor(terms, replacement, text_col, id_col), batch_format="pandas"
    )


def fingerprints(ds: ray.data.Dataset, text_col="text", id_col="doc_id") -> ray.data.Dataset:
    """(doc_id, fingerprint): polynomial rolling hash of the token stream
    modulo 2^61-1 (content fingerprint; deterministic)."""

    def fp(tokens: list[str]) -> int:
        h = 0
        for t in tokens:
            th = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
            h = (h * _BASE + th) % _MOD
        return h

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].str.strip().str.split(r"\s+", regex=True)
        toks = toks.map(lambda t: [] if t == [""] else t)
        return pd.DataFrame(
            {
                "doc_id": df[id_col].to_numpy(),
                "fingerprint": np.fromiter(
                    (fp(t) for t in toks), dtype=np.uint64, count=len(df)
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


def compression_ratio_scores(
    ds: ray.data.Dataset, text_col="text", id_col="doc_id", level: int = 6
) -> ray.data.Dataset:
    """Compression-ratio quality signal (RefinedWeb/Dolma-style): the
    zlib-compressed size of a document relative to its raw UTF-8 size,
    in fixed point — highly repetitive or templated text compresses
    far below natural prose, making the ratio a cheap dedup/quality
    feature that needs no model.

    Deterministic for a fixed zlib level, so downstream filters are
    reproducible across runs and cluster sizes; NOT SQL-expressible
    (no oracle twin — pytest pins exact values instead).  Map-only.
    -> (doc_id, raw_len, ratio_x1e6); empty documents get ratio 0."""
    import zlib

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or text_col not in df.columns:
            return pd.DataFrame(
                {id_col: pd.Series(dtype=np.int64),
                 "raw_len": pd.Series(dtype=np.int64),
                 "ratio_x1e6": pd.Series(dtype=np.int64)}
            )
        texts = df[text_col].fillna("").to_numpy(object)
        raw = np.fromiter((len(t.encode("utf-8")) for t in texts),
                          dtype=np.int64, count=len(texts))
        comp = np.fromiter(
            (len(zlib.compress(t.encode("utf-8"), level)) for t in texts),
            dtype=np.int64, count=len(texts),
        )
        ratio = np.where(raw > 0, 1_000_000 * comp // np.maximum(raw, 1), 0)
        return pd.DataFrame(
            {id_col: df[id_col].to_numpy(np.int64),
             "raw_len": raw,
             "ratio_x1e6": ratio.astype(np.int64)}
        )

    return ds.map_batches(fn, batch_format="pandas")


def bpe_fertility_by_lang(ds: ray.data.Dataset) -> pd.DataFrame:
    """Tokenizer fertility per language: BPE-ish subword count over
    whitespace word count — the multilingual tokenizer-budget audit
    (a fertility far above ~1.3e6 means the tokenizer fragments that
    language and its effective context shrinks).

    One streaming pass (regex compiled once per actor), per-batch
    per-lang integer partials, driver folds <= |langs| rows; the ratio
    is floored fixed-point so it hashes exactly against the SQL twin.
    -> (lang, n_bpe, n_ws, fertility_x1e6)."""
    from .chunks import _doc_tokens

    cols = {"lang": object, "n_bpe": np.int64, "n_ws": np.int64}

    class Partial:
        def __init__(self):
            import re as _re

            self.pat = _re.compile(BPE_PATTERN)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0 or "lang" not in df.columns:
                return pd.DataFrame(
                    {c: pd.Series(dtype=t) for c, t in cols.items()})
            nb = df["text"].map(
                lambda t: len(self.pat.findall(t))).to_numpy(np.int64)
            ws = _doc_tokens(df, "text").map(len).to_numpy(np.int64)
            g = pd.DataFrame({"lang": df["lang"].to_numpy(),
                              "n_bpe": nb, "n_ws": ws}).groupby(
                "lang", as_index=False)[["n_bpe", "n_ws"]].sum()
            return g

    parts = ds.map_batches(
        Partial, batch_format="pandas", concurrency=2
    ).to_pandas()
    out_cols = dict(cols, fertility_x1e6=np.int64)
    if parts.empty or "lang" not in parts.columns:
        return pd.DataFrame(
            {c: pd.Series(dtype=t) for c, t in out_cols.items()})
    g = parts.groupby("lang", as_index=False)[["n_bpe", "n_ws"]].sum()
    nb = g["n_bpe"].to_numpy(np.int64)
    ws = g["n_ws"].to_numpy(np.int64)
    fert = np.where(ws == 0, 0, (1_000_000 * nb) // np.maximum(ws, 1))
    return pd.DataFrame(
        {"lang": g["lang"].to_numpy(), "n_bpe": nb, "n_ws": ws,
         "fertility_x1e6": fert.astype(np.int64)}
    ).sort_values("lang", ignore_index=True)
