"""Text-analysis building blocks for the LLM-data-pipeline surface:
tokenization, shingling, token statistics, language ID, fingerprints.

All pure Column expressions (codegen'd, no UDFs) so they compose into
any query and push work JVM-side. Tokenization is whitespace-based to
match the synthetic `documents` corpus; the BPE-ish regex tokenizer is
`regexp_extract_all` with a letters/digits/other pattern.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small + deterministic; real pipelines would
# plug a fastText-style model in via pandas_udf (multimodal.py shows the
# UDF plumbing pattern).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "para"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "que"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"],
}

BPE_ISH_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def words(text_col) -> Column:
    """Whitespace tokenization (the corpus is space-separated)."""
    c = text_col if isinstance(text_col, Column) else F.col(text_col)
    return F.split(c, " ")


def word_shingles(words_col: Column, n: int = 3, sep: str = " ") -> Column:
    """All n-word shingles, in order (documents shorter than n words
    yield no shingles — including 0/1-token docs, which the previous
    `sequence(1, size-n+1)` form mishandled: descending sequence, then
    slice(_, 0, n) throws under ANSI).

    Formulation: n-1 chained `zip_with`s against self-shifted copies,
    then keep the first size-n+1 entries (tail entries are the short
    suffixes the shifts padded with null — concat_ws skips nulls).
    O(n x size) total vs the O(size x n)-slices-plus-array_join of
    `transform(sequence(...), i -> array_join(slice(...)))`; measured
    3.4x faster building the sf0.1 shingle index (0.44s vs 1.49s for
    260k shingle rows), the hot front of every dedup-family pipeline."""
    if n == 1:
        return words_col
    size = F.size(words_col)
    pad = F.concat(words_col, F.array_repeat(F.lit(None).cast("string"), n - 1))
    acc = words_col
    for k in range(1, n):
        acc = F.zip_with(acc, F.slice(pad, k + 1, size), lambda a, b: F.concat_ws(sep, a, b))
    return F.slice(acc, 1, F.greatest(size - (n - 1), F.lit(0)))


def distinct_shingles(words_col: Column, n: int = 3) -> Column:
    return F.array_distinct(word_shingles(words_col, n))


def regex_token_count(text_col) -> Column:
    """BPE-ish token count: letter runs, digit runs, single punctuation."""
    c = text_col if isinstance(text_col, Column) else F.col(text_col)
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_TOKEN_RE), F.lit(0))).cast("long")


def stopword_hits(words_col: Column, lang: str) -> Column:
    """# distinct stopwords of `lang` present in the document."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(F.array_distinct(words_col), sw)).cast("long")


def lang_scores(words_col: Column) -> dict[str, Column]:
    return {lang: stopword_hits(words_col, lang) for lang in STOPWORDS}


def predict_lang(words_col: Column) -> Column:
    """Argmax language by stopword hits; ties broken by language-code
    order (deterministic); 'und' (undetermined) when no hits at all."""
    scores = lang_scores(words_col)
    best = None
    for lang in sorted(STOPWORDS):  # later langs win only on strictly-greater
        s = scores[lang]
        if best is None:
            best = (s, F.lit(lang))
        else:
            cond = s > best[0]
            best = (F.when(cond, s).otherwise(best[0]), F.when(cond, F.lit(lang)).otherwise(best[1]))
    return F.when(best[0] > 0, best[1]).otherwise(F.lit("und"))


def punct_ratio(text_col) -> Column:
    c = text_col if isinstance(text_col, Column) else F.col(text_col)
    n_punct = F.length(F.regexp_replace(c, "[A-Za-z0-9\\s]", ""))
    return n_punct.cast("double") / F.length(c)


def mean_word_len(words_col: Column) -> Column:
    total = F.aggregate(
        F.transform(words_col, F.length),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    )
    return total.cast("double") / F.size(words_col)


def fingerprint_md5(text_col) -> Column:
    """Exact-dup fingerprint: md5 of whitespace-normalized lowercase text."""
    c = text_col if isinstance(text_col, Column) else F.col(text_col)
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), "\\s+", " "))


def rolling_hash(text_col, mod: int = 1_000_000_007, base: int = 31) -> Column:
    """Polynomial rolling hash over characters (Karp-Rabin style document
    fingerprint): h = (h*base + ascii(ch)) % mod, left-to-right fold.
    Pure `aggregate` over the char array — stays in codegen; the modulus
    keeps the accumulator < 2^60 so ANSI long arithmetic never overflows."""
    c = text_col if isinstance(text_col, Column) else F.col(text_col)
    chars = F.split(c, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )


def bpe_train(docs, n_merges: int = 6, id_col: str = "doc_id",
              text_col: str = "text", return_vocab: bool = False):
    """Train a BPE merge table from the corpus (Sennrich et al., ACL
    2016) — LEARNING the merges, not just applying a shipped table
    (`text_bpe_tokenize` is the apply side).

    Execution shape (r11, guide §5.1): the DISTRIBUTED part is the
    word-count vocabulary — one corpus scan collapsing 100 TB of text
    to the Heaps'-law-bounded (word, count) relation. The merge
    rounds themselves run on that bounded relation and nothing else
    (the scaling property real BPE trainers rely on — HuggingFace
    tokenizers hold exactly this table in memory), so they are
    bounded driver state, like the pocket-perceptron weights and the
    two-pass-quantile histogram. Per round: adjacent-pair counts
    weighted by word count → argmax pair (ties to lexicographically
    smallest) → greedy LEFT-TO-RIGHT merge (overlapping candidate
    runs resolve by parity — the same semantics the former
    relational island-parity implementation had, value-hash-pinned
    by the unrolled SQL oracle at three SFs). The former form ran
    the rounds as ~5 distributed jobs per round over a ≤ vocab-row
    relation — pure scheduling overhead (3.5 s at sf0.1 for 31
    distinct words); now one bounded pull + in-memory rounds
    (3.5 → ~0.8 s). FAILS LOUD past 2^22 distinct words (~200 MB of
    driver vocab — generous: web-scale corpora plateau near 10M
    after the C4-style filters this pipeline applies upstream).

    Returns (round, pair_left, pair_right, merged, pair_count) — one
    row per learned merge; with `return_vocab`, also the trained
    (w, wc, sym) segmentation relation (tokenizing a corpus is a join
    against it, never a re-run of the merge loop per document)."""
    spark = docs.sparkSession
    vocab_rows = (
        docs.select(F.explode(words(F.col(text_col))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .collect()  # bounded: Heaps'-law vocabulary, guarded below
    )
    if len(vocab_rows) > (1 << 22):
        raise RuntimeError(
            f"bpe_train: {len(vocab_rows)} distinct words exceeds the "
            "2^22 bounded-driver vocabulary budget; shard the merge "
            "loop (per-prefix sub-vocabularies) before lifting this"
        )
    # split(w, "") semantics: per-character symbols
    vocab = [(r["w"], int(r["wc"]), list(r["w"])) for r in vocab_rows]
    merges = []
    for rnd in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for _w, wc, sym in vocab:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + wc
        if not counts:
            break  # no adjacent pairs anywhere: nothing left to learn
        (a, b), pc = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, a, b, a + b, pc))
        nxt = []
        for w, wc, sym in vocab:
            out, i, n = [], 0, len(sym)
            while i < n:
                if i + 1 < n and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nxt.append((w, wc, out))
        vocab = nxt
    merges_df = spark.createDataFrame(
        merges,
        "round long, pair_left string, pair_right string, "
        "merged string, pair_count long",
    )
    if return_vocab:
        vocab_df = spark.createDataFrame(
            vocab, "w string, wc long, sym array<string>"
        )
        return merges_df, vocab_df
    return merges_df


def wordpiece_segment(words: "DataFrame", vocab: list[str], max_len: int,
                      word_col: str = "w") -> "DataFrame":
    """Greedy longest-match subword segmentation (WordPiece-inference
    style) of a DISTINCT-word relation against a fixed subword vocab.

    At each position try the longest candidate first (max_len down to
    2); a position matching nothing falls back to its single character
    (the implicit char-level vocab — nothing is ever unencodable).
    Python slicing w[p:p+l] truncates at the word end exactly like
    SQL substr, so the segmentation is cell-identical to the oracle's
    recursive-CTE form.

    Scale: segmentation runs over the VOCABULARY relation (distinct
    words — Heaps'-law-bounded), never the corpus; tokenizing 100 TB
    is this bounded pass plus a token-count join against word
    frequencies. The vocab list broadcasts via closure capture (a few
    KB); the pass is Arrow-batched mapInPandas, O(|word| · max_len)
    per distinct word.
    """
    vocab_set = frozenset(vocab)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in words.schema.fields
    ) + ", toks array<string>"

    def seg(batches):
        for pdf in batches:
            toks_col = []
            for w in pdf[word_col]:
                p, toks = 0, []
                n = len(w)
                while p < n:
                    for ln in range(max_len, 1, -1):
                        if w[p:p + ln] in vocab_set:
                            toks.append(w[p:p + ln])
                            p += ln
                            break
                    else:
                        toks.append(w[p])
                        p += 1
                toks_col.append(toks)
            out = pdf.copy()
            out["toks"] = toks_col
            yield out

    return words.mapInPandas(seg, schema=out_schema)
