"""Byte-pair-encoding tokenizer training and application (SURVEY §2
B25 — the tokenizer-training step of an LLM data pipeline).

The standard production shape (Sennrich et al. 2016; every real BPE
trainer, e.g. the HF `tokenizers` WordPiece/BPE trainers, works this
way): the CORPUS-sized work — word frequency counting — is
distributed (one shuffle, map-side partial combine), and the merge
loop then runs over the resulting word-frequency table, which is
bounded by the VOCABULARY, not the corpus.  At 100 TB the distinct-
word table is millions of rows where the corpus is trillions of
tokens; ``min_freq`` caps it further (rare words can't influence the
top merges anyway).

Application (``bpe_encode``) is an Arrow-batched pandas UDF — the one
genuinely Python-shaped stage in the library's text path (per-word
greedy merge resolution is a data-dependent loop no SQL expression
expresses).  It memoizes per distinct word within each batch, so cost
scales with distinct words per batch, not tokens.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens_col

_END = "▁"  # end-of-word sentinel appended to a word's last symbol


def word_counts(df: DataFrame, text_col: str = "text", min_freq: int = 1) -> DataFrame:
    """(word, freq) — the distributed stage of BPE training: tokenize,
    explode, ONE count aggregate (map-side partial combine folds each
    task's token stream to its local vocabulary before the shuffle, so
    the exchange carries ~distinct-words×tasks rows, not the corpus)."""
    counts = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if min_freq > 1:
        counts = counts.filter(F.col("freq") >= min_freq)
    return counts


def _merge_word(symbols: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == pair[0] and symbols[i + 1] == pair[1]:
            out.append(symbols[i] + symbols[i + 1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def learn_merges_from_counts(
    counts: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a (word, freq) table — driver-
    side by design: the table is vocabulary-bounded (see module doc).
    Deterministic: ties in pair frequency break lexicographically, so
    the same corpus always yields the same merge list regardless of
    partitioning or input order."""
    words: dict[tuple[str, ...], int] = {}
    for w, f in counts:
        if not w:
            continue
        syms = tuple(list(w[:-1]) + [w[-1] + _END])
        words[syms] = words.get(syms, 0) + f
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_freq: Counter = Counter()
        for syms, f in words.items():
            for a, b in zip(syms, syms[1:]):
                pair_freq[(a, b)] += f
        if not pair_freq:
            break
        best = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_freq[best] < 2:
            break  # nothing left that repeats; further merges are noise
        merges.append(best)
        words = _apply_merge_all(words, best)
    return merges


def _apply_merge_all(
    words: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    out: dict[tuple[str, ...], int] = {}
    for syms, f in words.items():
        merged = _merge_word(syms, pair)
        out[merged] = out.get(merged, 0) + f
    return out


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_freq: int = 1,
    max_vocab: int | None = 1_000_000,
) -> list[tuple[str, str]]:
    """Train BPE merges on a corpus: distributed word count →
    driver-side merge loop over the bounded frequency table.

    ``max_vocab`` hard-bounds the driver collect: the word table comes
    back through a distributed top-N (``TakeOrderedAndProject`` — freq
    desc, word asc, fully deterministic), so at 100 TB a permissive
    ``min_freq`` can no longer swamp the driver.  If the cap BINDS
    (the corpus has more distinct words than ``max_vocab``):

    - with ``min_freq`` left at 1 this raises a loud ``ValueError`` —
      the caller never chose a bound, and silently training on a
      truncated vocabulary would be a correctness surprise;
    - with an explicit ``min_freq > 1`` the top-``max_vocab`` most
      frequent words are kept (the standard trainer behavior — rare
      tail words contribute ~nothing to pair frequencies).

    ``max_vocab=None`` removes the cap (small-corpus/test escape
    hatch)."""
    wc = word_counts(df, text_col, min_freq)
    if max_vocab is None:
        counts = [(r.word, r.freq) for r in wc.collect()]
        return learn_merges_from_counts(counts, num_merges)
    if max_vocab < 1:
        raise ValueError(f"max_vocab must be >= 1 or None, got {max_vocab}")
    # +1 sentinel row: detects that the cap binds without a second
    # count() job; the orderBy+limit lowers to a distributed top-N
    top = wc.orderBy(F.col("freq").desc(), F.col("word")).limit(max_vocab + 1)
    counts = [(r.word, r.freq) for r in top.collect()]
    if len(counts) > max_vocab:
        if min_freq <= 1:
            raise ValueError(
                f"corpus has more than max_vocab={max_vocab} distinct words and "
                "min_freq is 1 — refusing to silently truncate the training "
                "vocabulary; set min_freq > 1 (drops the rare tail explicitly) "
                "or raise max_vocab"
            )
        counts = counts[:max_vocab]
    return learn_merges_from_counts(counts, num_merges)


def merges_df(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """(rank, left, right) — the persistable form of a merge list
    (write with ``write_parquet``, reload with ``load_merges``), so a
    tokenizer trained once is applied to later corpus batches without
    retraining — same index-persistence discipline as the MinHash and
    IVF indexes."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)], ["rank", "left", "right"]
    )


def load_merges(df: DataFrame) -> list[tuple[str, str]]:
    return [(r.left, r.right) for r in df.orderBy("rank").collect()]


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2-style greedy application: repeatedly merge the present
    pair with the LOWEST training rank until none applies."""
    syms = list(word[:-1]) + [word[-1] + _END] if word else []
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply trained merges: adds ``out_col`` (array<string> of subword
    tokens, end-of-word sentinel U+2581 kept on word-final subwords so
    the encoding is lossless — joining a word's subwords and stripping
    the sentinel reconstructs the word).

    Arrow ``mapInPandas`` stage over the RAW text column (tokenization
    happens Python-side, replicating ``text.tokens_col``'s ASCII
    ``\\s+`` split + lowercase exactly — the reconstruction test pins
    parity).  mapInPandas rather than a scalar pandas UDF expression on
    purpose: a whole-row Arrow stage composes with arbitrarily complex
    upstream projections (e.g. ``cut_spans``'s rebuild), where a
    UDF-in-projection can be left unextracted by the optimizer inside a
    codegen-fallback interpreted Project, which cannot evaluate Python
    UDFs (observed on Spark 4.1 with the cut_spans expression tree).
    The rank table rides the task closure (it is merge-list-sized), and
    each batch memoizes per DISTINCT word, so hot words (Zipf's law:
    most of the stream) are encoded once per batch."""
    import re

    from pyspark.sql import types as T

    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    ranks = {pair: i for i, pair in enumerate(merges)}
    ws = re.compile(r"\s+", re.ASCII)  # Java \s is ASCII-only; match it
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )

    def run(batches):
        cache: dict[str, list[str]] = {}

        def enc_doc(text):
            out: list[str] = []
            if text is None:
                return out
            for w in ws.split(text.lower()):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _encode_word(w, ranks)
                out.extend(got)
            return out

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[text_col].map(enc_doc)
            yield pdf

    return df.mapInPandas(run, out_schema)
