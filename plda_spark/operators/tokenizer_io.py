"""Tokenizer model persistence: one JSON artifact per trained tokenizer.

A pipeline trains a tokenizer once and applies it from every later job
(and from Structured Streaming twins), so the learned tables need a
durable, engine-portable form.  This is that seam for all three trained
families:

- BPE (:mod:`.bpe`): the ordered merge list.
- byte-level BPE (:mod:`.byte_bpe`): the ordered merge list over the
  remapped byte alphabet — pass ``{"kind": "byte_bpe", "merges": [...]}``
  since a bare merge list is indistinguishable from word-level BPE.
- unigram-LM (:mod:`.unigram`): the ``(piece, logprob)`` vocabulary.
- WordPiece (:mod:`.wordpiece`): merges + final vocab.

Format: a single JSON text file (``{"kind", "format_version", ...}``)
written through the Hadoop FileSystem API — local/HDFS/S3A alike, same
transport as the snapshot-table manifests.  Tokenizer models are
kB-to-MB driver-side objects by construction (the trainers already
return them), so a driver-side write is the right shape — no
distributed job for a 30k-entry table.

``encode_with`` routes a loaded model to its encoder, so callers can
apply any persisted tokenizer without knowing its family.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

__all__ = ["save_tokenizer", "load_tokenizer", "encode_with"]

_FORMAT_VERSION = 1


def _payload(tok) -> dict:
    """Normalize a trainer's return value into (kind, payload)."""
    if isinstance(tok, dict) and {"merges", "vocab"} <= set(tok):
        return {"kind": "wordpiece", "merges": [list(m) for m in tok["merges"]],
                "vocab": list(tok["vocab"])}
    if isinstance(tok, dict) and tok.get("kind") == "byte_bpe":
        return {"kind": "byte_bpe",
                "merges": [list(m) for m in tok["merges"]]}
    if isinstance(tok, dict) and "kind" in tok:
        return dict(tok)
    if isinstance(tok, list) and tok and isinstance(tok[0], (list, tuple)):
        first = tok[0]
        if len(first) == 2 and isinstance(first[1], float):
            return {"kind": "unigram",
                    "vocab": [[p, lp] for p, lp in tok]}
        if len(first) == 2 and isinstance(first[1], str):
            return {"kind": "bpe", "merges": [list(m) for m in tok]}
    raise ValueError(
        "unrecognized tokenizer object: expected bpe merges "
        "[(a, b), ...], unigram vocab [(piece, logprob), ...], or a "
        "wordpiece {'merges', 'vocab'} dict"
    )


def save_tokenizer(spark: SparkSession, tok, path: str) -> str:
    """Persist a trained tokenizer as one JSON file at ``path``;
    returns the detected kind.  Accepts exactly what the trainers
    return (``bpe_train`` merges, ``unigram_train`` vocab,
    ``wordpiece_train`` dict)."""
    from plda_spark.sources.snapshot import _FS

    doc = _payload(tok)
    doc["format_version"] = _FORMAT_VERSION
    fs = _FS(spark, path)
    parent = path.rsplit("/", 1)[0]
    if parent and parent != path:
        fs.mkdirs(parent)
    fs.write_text(path, json.dumps(doc))
    return doc["kind"]


def load_tokenizer(spark: SparkSession, path: str) -> dict:
    """Load a persisted tokenizer; returns the normalized dict with
    trainer-shaped fields restored (tuples for merges, (piece, logprob)
    pairs for unigram)."""
    from plda_spark.sources.snapshot import _FS

    fs = _FS(spark, path)
    if not fs.exists(path):
        raise FileNotFoundError(f"no tokenizer artifact at {path}")
    doc = json.loads(fs.read_text(path))
    v = doc.get("format_version")
    if v != _FORMAT_VERSION:
        raise ValueError(
            f"tokenizer artifact {path} has format_version {v!r}; this "
            f"reader supports {_FORMAT_VERSION}"
        )
    if doc["kind"] in ("bpe", "byte_bpe"):
        doc["merges"] = [tuple(m) for m in doc["merges"]]
    elif doc["kind"] == "unigram":
        doc["vocab"] = [(p, float(lp)) for p, lp in doc["vocab"]]
    elif doc["kind"] == "wordpiece":
        doc["merges"] = [tuple(m) for m in doc["merges"]]
    else:
        raise ValueError(f"unknown tokenizer kind {doc['kind']!r}")
    return doc


def encode_with(
    docs: DataFrame,
    tok: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a loaded tokenizer to ``docs`` — dispatches to the
    family's own encoder, so callers need not know which tokenizer a
    pipeline was configured with."""
    kind = tok.get("kind")
    if kind == "bpe":
        from .bpe import bpe_encode

        return bpe_encode(docs, tok["merges"], text_col=text_col, id_col=id_col)
    if kind == "byte_bpe":
        from .byte_bpe import byte_bpe_encode

        return byte_bpe_encode(
            docs, tok["merges"], text_col=text_col, id_col=id_col
        )
    if kind == "unigram":
        from .unigram import unigram_encode

        return unigram_encode(docs, tok["vocab"], text_col=text_col, id_col=id_col)
    if kind == "wordpiece":
        from .wordpiece import wordpiece_encode

        return wordpiece_encode(docs, tok["vocab"], text_col=text_col, id_col=id_col)
    raise ValueError(f"unknown tokenizer kind {kind!r}")
