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


def _trigram_profile(text: str, top: int = 200) -> dict[bytes, int]:
    """rank (0 = most frequent) of the top UTF-8 byte trigrams."""
    from collections import Counter

    b = text.lower().encode()
    grams = Counter(b[i : i + 3] for i in range(len(b) - 2))
    return {g: r for r, (g, _) in enumerate(grams.most_common(top))}


class LangIdStage:
    """n-gram heuristic language ID (Cavnar–Trenkle-style trigram
    profiles). Actor-pool stage: profiles compile once per actor in
    __init__ into a sorted vocab-key array + a (vocab, lang) weight
    matrix; __call__ classifies the whole batch with array ops — byte
    trigrams from a zero-copy view of the column, searchsorted into the
    vocab, one scatter-add into a (doc, lang) score matrix, argmax. No
    per-row Python."""

    OUT_COL = "lang_pred"
    HEAD_BYTES = 1000  # classify on the doc head, like the rank scheme did

    def __init__(self, text_col: str = "text", top: int = 200):
        self.text_col = text_col
        self.top = top
        self.langs = sorted(_LANG_SAMPLES)
        vocab: dict[int, np.ndarray] = {}
        for li, lang in enumerate(self.langs):
            for g, rank in _trigram_profile(_LANG_SAMPLES[lang], top).items():
                key = (g[0] << 16) | (g[1] << 8) | g[2]
                row = vocab.setdefault(key, np.zeros(len(self.langs), dtype=np.int64))
                row[li] = top - rank  # weight: most-characteristic trigram = top
        keys = np.fromiter(vocab.keys(), dtype=np.int64, count=len(vocab))
        order = np.argsort(keys)
        self.vocab_keys = keys[order]
        self.weights = np.stack([vocab[int(k)] for k in self.vocab_keys])

    def __call__(self, batch: pa.Table) -> pa.Table:
        from consult_ray.stages.fingerprint import _utf8_concat_and_offsets

        text = batch[self.text_col].combine_chunks()
        if text.null_count:
            text = text.fill_null("")
        head = pc.utf8_slice_codeunits(pc.utf8_lower(text), 0, self.HEAD_BYTES)
        concat, offsets = _utf8_concat_and_offsets(head)
        n_docs = batch.num_rows
        scores = np.zeros((n_docs, len(self.langs)), dtype=np.int64)
        total = int(offsets[-1])
        if total >= 3:
            b = concat.astype(np.int64)
            tri = (b[:-2] << 16) | (b[1:-1] << 8) | b[2:]
            starts = np.arange(len(tri), dtype=np.int64)
            doc_of = np.searchsorted(offsets, starts, side="right") - 1
            valid = (starts + 3) <= offsets[doc_of + 1]
            tri, doc_of = tri[valid], doc_of[valid]
            pos = np.searchsorted(self.vocab_keys, tri)
            pos_c = np.clip(pos, 0, len(self.vocab_keys) - 1)
            hit = self.vocab_keys[pos_c] == tri
            np.add.at(scores, doc_of[hit], self.weights[pos_c[hit]])
        best = np.argmax(scores, axis=1)
        known = scores[np.arange(n_docs), best] > 0
        lang_arr = np.array(self.langs, dtype=object)
        preds = np.where(known, lang_arr[best], "und")
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
    """64-bit whole-document content fingerprint (polynomial hash of the
    raw text bytes) — the exact-dedup key. Returned as int64
    `content_hash` for shuffle-friendliness. Fully vectorized: zero-copy
    view of the column bytes + one prefix-sum hash pass for the batch
    (hash_bytes_batch_u64), bit-identical to the scalar hash_bytes_u64
    per doc (nulls hash as empty strings)."""
    from consult_ray.functions.hashing import hash_bytes_batch_u64
    from consult_ray.stages.fingerprint import _utf8_concat_and_offsets

    text = batch[text_col].combine_chunks()
    if text.null_count:
        text = text.fill_null("")
    concat, offsets = _utf8_concat_and_offsets(text)
    hashes = hash_bytes_batch_u64(concat, offsets)
    return batch.append_column("content_hash", pa.array(hashes.view(np.int64)))
