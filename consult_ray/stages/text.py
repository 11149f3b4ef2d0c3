"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All stateless, vectorized map_batches transforms over Arrow batches.
Where a kernel needs compiled state (regexes, n-gram profiles) it is a
callable CLASS for actor-pool execution — setup once per actor in
__init__ (the map-stage analog of CONSULT loading its library once per
process, /root/reference/main_search.cpp:384-658).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from consult_ray.functions.hashing import hash_bytes_u64

# Small per-language character-trigram profiles for the n-gram heuristic
# language identifier. Deterministic, dependency-free: profiles are the
# most frequent trigrams of a tiny embedded sample per language.
_LANG_SAMPLES = {
    "en": "the quick brown fox jumps over the lazy dog and then it runs "
          "this is a test of the english language with common words that "
          "and the of to in is was he for it with as his on be at by had",
    "de": "der schnelle braune fuchs springt über den faulen hund und die "
          "das ist ein test der deutschen sprache mit häufigen wörtern "
          "und der die das von zu den mit sich des auf für ist im dem nicht",
    "fr": "le renard brun rapide saute par dessus le chien paresseux et "
          "ceci est un test de la langue française avec des mots courants "
          "le de la et les des en un une du que pour dans ce il qui ne sur",
    "es": "el rápido zorro marrón salta sobre el perro perezoso y luego "
          "esta es una prueba del idioma español con palabras comunes "
          "el la de que y en un ser se no haber por con su para como estar",
    "zh": "敏捷的棕色狐狸跳过懒狗 这是中文语言测试 包含常见词汇 我们 他们 这个 那个 可以 没有 什么 时候 知道 现在",
}


def _trigram_profile(text: str, top: int = 200) -> dict[str, int]:
    from collections import Counter

    t = f"  {text.lower()}  "
    grams = Counter(t[i : i + 3] for i in range(len(t) - 2))
    return {g: r for r, (g, _) in enumerate(grams.most_common(top))}


class LangIdStage:
    """n-gram heuristic language ID (out-of-place rank distance, the
    classic Cavnar–Trenkle scheme). Actor-pool stage: profiles compiled
    once per actor in __init__."""

    OUT_COL = "lang_pred"

    def __init__(self, text_col: str = "text", top: int = 200):
        self.text_col = text_col
        self.top = top
        self.profiles = {lang: _trigram_profile(s, top) for lang, s in _LANG_SAMPLES.items()}

    def _classify(self, text: str) -> str:
        if not text:
            return "und"
        t = f"  {text.lower()[:1000]}  "
        from collections import Counter

        grams = Counter(t[i : i + 3] for i in range(len(t) - 2))
        doc_ranked = {g: r for r, (g, _) in enumerate(grams.most_common(self.top))}
        best, best_score = "und", None
        for lang, prof in self.profiles.items():
            score = 0
            for g, r in doc_ranked.items():
                score += abs(prof[g] - r) if g in prof else self.top
            if best_score is None or score < best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self._classify(t or "") for t in batch[self.text_col].to_pylist()]
        return batch.append_column(self.OUT_COL, pa.array(preds, pa.string()))


_STOPWORDS = (
    "the a an and or of to in is was for it with as on be at by that this "
    "he she they we you i not are were had has have from but"
).split()


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n_tokens (single-space split — duckdb string_split-compatible) and
    n_chars2 per row, fully vectorized in pyarrow.compute."""
    text = batch[text_col]
    toks = pc.split_pattern(text, pattern=" ")
    n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
    n_chars2 = pc.cast(pc.utf8_length(text), pa.int64())
    return batch.append_column("n_tokens", n_tokens).append_column("n_chars2", n_chars2)


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality features: mean token length, stopword ratio,
    punctuation ratio, alpha ratio, plus a [0,1] composite score.
    Vectorized: arrow kernels + numpy; no Python loop over rows."""
    text = batch[text_col]
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
    toks = pc.split_pattern(text, pattern=" ")
    n_tokens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.float64)
    n_tokens = np.maximum(n_tokens, 1)

    flat = pc.list_flatten(toks)
    tok_doc = np.repeat(np.arange(batch.num_rows), pc.list_value_length(toks).to_numpy(zero_copy_only=False))
    is_stop = pc.is_in(flat, value_set=pa.array(_STOPWORDS)).to_numpy(zero_copy_only=False)
    stop_counts = np.bincount(tok_doc, weights=is_stop.astype(np.float64), minlength=batch.num_rows)

    n_punct = pc.count_substring_regex(text, r"[^\w\s]").to_numpy(zero_copy_only=False).astype(np.float64)
    n_alpha = pc.count_substring_regex(text, r"[A-Za-z]").to_numpy(zero_copy_only=False).astype(np.float64)

    denom = np.maximum(n_chars, 1)
    mean_tok_len = (n_chars - (n_tokens - 1)) / n_tokens
    stop_ratio = stop_counts / n_tokens
    punct_ratio = n_punct / denom
    alpha_ratio = n_alpha / denom

    # composite: plausible web text has mid-length tokens, some stopwords,
    # low punctuation density
    score = (
        np.clip(1 - np.abs(mean_tok_len - 5.0) / 5.0, 0, 1) * 0.4
        + np.clip(stop_ratio * 4, 0, 1) * 0.3
        + np.clip(1 - punct_ratio * 5, 0, 1) * 0.3
    )
    out = batch
    for name, arr in [
        ("mean_token_len", mean_tok_len),
        ("stop_ratio", stop_ratio),
        ("punct_ratio", punct_ratio),
        ("alpha_ratio", alpha_ratio),
        ("quality_score", score),
    ]:
        out = out.append_column(name, pa.array(arr))
    return out


def doc_fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit whole-document content fingerprint (rolling polynomial hash
    of the raw text bytes) — the exact-dedup key. Returned as int64
    `content_hash` for shuffle-friendliness."""
    hashes = np.fromiter(
        (hash_bytes_u64((t or "").encode()) for t in batch[text_col].to_pylist()),
        dtype=np.uint64,
        count=batch.num_rows,
    )
    return batch.append_column("content_hash", pa.array(hashes.view(np.int64)))
