"""Sequence-encoding operators (SURVEY §2.2 projections P1-P10, O4).

The reference's per-example preprocessing, re-expressed as row-local
Spark column expressions (higher-order array functions — JVM-side, no
Python, no shuffle):

* P7  space→``[SPA]`` substitution (/root/reference/data_process.ipynb
  cell-7: ``"[SPA]" if word == " " else word``);
* P4  ``[SPA]`` drop on the BERT path (/root/reference/utils.py:135-138);
* P5  ``[CLS]``/``[SEP]`` sequence framing (/root/reference/utils.py:140-148);
* O4  truncation to ``max_length``
  (/root/reference/torch_version/data_tools.py:165-170);
* P1  token→id lookup with ``[UNK]`` default (/root/reference/utils.py:47)
  as a broadcast join against the vocabulary dimension — the table-level
  restatement of ``tf.nn.embedding_lookup``'s gather (SURVEY §2.4 J2);
* P2  strict label→id (no default) — preserved as an inner join;
* P10 id→token decode (/root/reference/train_lstm_crf.py:161-164);
* P8  word→char repeat expansion for word-level features
  (/root/reference/utils.py:443-450: word id repeated ``len(word)`` times
  so word features align per char);
* P6  gold-span→BIO projection (/root/reference/data_process.ipynb cell-7).

Scale notes: every operator here is a narrow per-row map — Catalyst keeps
them inside one whole-stage-codegen span over the scan. The only joins are
against the vocabulary dimension (broadcast; a vocab is ≤100k rows even at
10^12-turn corpus scale — the reference's is 89,303 rows,
/root/reference/data/vocab_word.txt).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PAD, UNK, SEP, SPA = "[PAD]", "[UNK]", "[SEP]", "[SPA]"
RESERVED = [(PAD, 0), (UNK, 1), (SEP, 2), (SPA, 3)]
UNK_ID = 1


# ---------------------------------------------------------------------------
# char-level framing (P7 + P4 + O4 + P5)
# ---------------------------------------------------------------------------


def char_tokens_col(text: Column) -> Column:
    """Char-level tokenization with space→``[SPA]`` substitution (P7)."""
    return F.transform(
        F.split(text, ""),
        lambda c: F.when(c == " ", F.lit(SPA)).otherwise(c),
    )


def bert_frame_col(text: Column, max_len: int = 32) -> Column:
    """BERT input framing over char tokens: drop ``[SPA]`` (P4), truncate
    content to ``max_len`` (O4 — truncation before framing, exactly the
    tokenizer's ``truncation=True`` semantics), wrap ``[CLS]…[SEP]``
    (P5)."""
    content = F.filter(char_tokens_col(text), lambda c: c != SPA)
    content = F.slice(content, 1, max_len)
    return F.concat(
        F.array(F.lit("[CLS]")), content, F.array(F.lit("[SEP]"))
    )


# ---------------------------------------------------------------------------
# vocabulary encode / decode (P1, P2, P10; J2-as-join)
# ---------------------------------------------------------------------------


def build_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-driven vocabulary dimension (S1 semantics: stable ids after
    the 4 reserved rows). Deterministic: ids follow token sort order, not
    first-seen order, so the result is partitioning-invariant.

    The global ``row_number`` window is fine for a dimension table (vocab
    cardinality ≪ corpus size; the reference's largest vocab is 89,303
    rows). The distinct() underneath is a proper distributed aggregation —
    only the final numbered dimension is single-partition."""
    spark = df.sparkSession
    # a corpus containing a literal reserved token (e.g. "[SPA]", which
    # char_tokens_col itself injects) must not produce a duplicate vocab
    # key — the reserved rows always win, like the reference's vocab file
    # where they occupy the first 4 lines exactly once
    toks = (
        df.select(F.explode(F.split(text_col, " ")).alias("token"))
        .where(~F.col("token").isin([t for t, _ in RESERVED]))
        .distinct()
    )
    w = Window.orderBy("token")
    vocab = toks.select(
        "token", (F.row_number().over(w) + 3).cast("int").alias("id")
    )
    reserved = spark.createDataFrame(RESERVED, "token string, id int")
    return vocab.unionByName(reserved)


def encode_tokens(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per (doc, position): token, its id (``[UNK]``=1 fallback —
    P1), and the id→token round-trip decode (P10). Both lookups are
    broadcast hash joins against the vocabulary dimension."""
    pos = df.select(
        F.col(id_col),
        F.posexplode(F.split(text_col, " ")).alias("pos", "token"),
    )
    enc = pos.join(F.broadcast(vocab), "token", "left").withColumn(
        "id", F.coalesce(F.col("id"), F.lit(UNK_ID))
    )
    dec = F.broadcast(
        vocab.select(F.col("id"), F.col("token").alias("decoded"))
    )
    return (
        enc.join(dec, "id", "left")
        .withColumn("decoded", F.coalesce("decoded", F.lit(UNK)))
        .select(id_col, "pos", "token", "id", "decoded")
    )


def encode_labels_strict(
    df: DataFrame, label_vocab: DataFrame, label_col: str = "label"
) -> DataFrame:
    """P2: strict label→id — an inner join, so an unseen label DROPS the
    row instead of defaulting (callers assert count preservation, which is
    the distributed restatement of the reference's KeyError)."""
    return df.join(
        F.broadcast(label_vocab.withColumnRenamed("token", label_col)),
        label_col,
    )


# ---------------------------------------------------------------------------
# word-level-feature expansion (P8)
# ---------------------------------------------------------------------------


def wlf_expand_col(words: Column) -> Column:
    """Word repeated ``len(word)`` times, flattened — aligns word-level
    features to char positions (``[SPA]`` counts as one char, which holds
    here because the substitute happens after expansion in the reference's
    char accounting, /root/reference/utils.py:443-450)."""
    return F.flatten(
        F.transform(
            words, lambda w: F.array_repeat(w, F.length(w).cast("int"))
        )
    )


# ---------------------------------------------------------------------------
# subword alignment (P9)
# ---------------------------------------------------------------------------

IGNORE_LABEL = -100


def subword_pieces_col(tokens: Column, max_piece: int = 4) -> Column:
    """P9 subword/word-id alignment
    (/root/reference/torch_version/data_tools.py:192-225): words split
    into pieces, each piece tagged with its source word id and piece
    index. The reference uses the HF fast tokenizer's ``word_ids()``
    (library not in this container); the deterministic stand-in chunks
    every word into ``max_piece``-char pieces — the ALIGNMENT semantics
    (what P9 actually is) are identical and the splitter is swappable.

    Returns array<struct<word_id:int, piece_idx:int, piece:string>>,
    row-local."""
    from ner_spark.functions.colutil import let

    def build(toks: Column) -> Column:
        def pieces_of(i: Column) -> Column:
            word = F.element_at(toks, i + 1)
            n_pieces = F.ceil(F.length(word) / max_piece).cast("int")
            return F.transform(
                F.sequence(F.lit(0), F.greatest(n_pieces - 1, F.lit(0))),
                lambda j: F.struct(
                    i.cast("int").alias("word_id"),
                    j.cast("int").alias("piece_idx"),
                    F.substring(word, j * max_piece + 1, max_piece).alias("piece"),
                ),
            )

        # sequence(0, -1) would DESCEND ([0, -1]) — guard the empty case
        return F.when(
            F.size(toks) == 0,
            F.array().cast(
                "array<struct<word_id:int,piece_idx:int,piece:string>>"
            ),
        ).otherwise(
            F.flatten(
                F.transform(F.sequence(F.lit(0), F.size(toks) - 1), pieces_of)
            )
        )

    return let(tokens, build)


PIECES_TYPE = "array<struct<word_id:int,piece_idx:int,piece:string>>"


def wordpiece_pieces(word: str, vocab, unk: str = UNK, max_chars: int = 200) -> list[str]:
    """Greedy longest-match-first WordPiece for ONE word (the published
    BERT tokenization algorithm, reimplemented from its description):
    repeatedly take the longest vocab entry matching at the cursor,
    prefixing continuations with ``##``; if no prefix matches, the whole
    word becomes ``unk``. Plain Python by design — it runs inside the
    Arrow-batched pandas UDF below, never per-row through Py4J."""
    if not word:
        return []
    if len(word) > max_chars:
        return [unk]
    pieces: list[str] = []
    start = 0
    while start < len(word):
        end = len(word)
        cur = None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [unk]
        pieces.append(cur)
        start = end
    return pieces


def subword_pieces_udf(tokenizer):
    """Pluggable tokenizer slot for P9
    (/root/reference/torch_version/data_tools.py:192-225): given any
    per-word tokenizer callable ``word -> list[piece]`` (a real WordPiece
    vocab via ``wordpiece_pieces``, a HF fast tokenizer's per-word
    closure, …), return an Arrow-batched pandas UDF mapping a token-array
    column to the SAME ``array<struct<word_id, piece_idx, piece>>`` the
    deterministic ``subword_pieces_col`` emits — so ``align_labels_col``
    (first-piece label, continuation −100) composes unchanged on top of
    either splitter. The deterministic splitter stays the oracle-checked
    default; this is the injection point a user with a real BERT vocab
    plugs into."""

    @F.pandas_udf(PIECES_TYPE)
    def run(tokens: pd.Series) -> pd.Series:
        out = []
        for toks in tokens:
            rows = []
            for wid, word in enumerate([] if toks is None else toks):
                for pidx, piece in enumerate(tokenizer(word)):
                    rows.append(
                        {"word_id": wid, "piece_idx": pidx, "piece": piece}
                    )
            out.append(rows)
        return pd.Series(out)

    return run


def wordpiece_udf(vocab, unk: str = UNK):
    """``subword_pieces_udf`` specialised to a real WordPiece vocabulary
    (any set/frozenset of pieces, e.g. the lines of a BERT vocab file).
    The vocab set ships once per executor inside the serialized UDF —
    the same distribution story as the tagger weights."""
    v = frozenset(vocab)
    return subword_pieces_udf(lambda w: wordpiece_pieces(w, v, unk))


def align_labels_col(
    pieces: Column, labels: Column, ignore: int = IGNORE_LABEL
) -> Column:
    """Project word-level label ids onto pieces: the FIRST piece of a
    word carries the word's label, continuation pieces get ``-100``
    (the loss-ignore sentinel, data_tools.py:199-200)."""
    return F.transform(
        pieces,
        lambda p: F.struct(
            p["word_id"].alias("word_id"),
            p["piece_idx"].alias("piece_idx"),
            p["piece"].alias("piece"),
            F.when(
                p["piece_idx"] == 0, F.element_at(labels, p["word_id"] + 1)
            )
            .otherwise(F.lit(ignore))
            .cast("int")
            .alias("label_id"),
        ),
    )


# ---------------------------------------------------------------------------
# gold-span → BIO projection (P6)
# ---------------------------------------------------------------------------


def spans_to_bio_col(ner: Column, n_tokens: Column) -> Column:
    """Per-position BIO label array from gold spans
    ``array<struct<index: array<int>, type: string>>`` — ``B-type`` at a
    span's first position, ``I-type`` inside, ``O`` elsewhere. Spans from
    BIO extraction never overlap, so the first match is the only match."""

    def label_at(pos: Column) -> Column:
        # try_element_at: null (not an ANSI error) when no span covers pos
        sp = F.try_element_at(
            F.filter(ner, lambda s: F.array_contains(s["index"], pos)), F.lit(1)
        )
        return F.when(sp.isNull(), F.lit("O")).otherwise(
            F.concat(
                F.when(
                    F.try_element_at(sp["index"], F.lit(1)) == pos, F.lit("B-")
                ).otherwise(F.lit("I-")),
                sp["type"],
            )
        )

    # sequence(0, -1) descends; zero-length sequences need an empty array
    return F.when(
        n_tokens <= 0, F.array().cast("array<string>")
    ).otherwise(
        F.transform(F.sequence(F.lit(0), n_tokens.cast("int") - 1), label_at)
    )
