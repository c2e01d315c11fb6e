"""Raw WARC (HTML) source — the step BEFORE WET in a Common Crawl
pipeline: ``.warc.gz`` shards hold ``response`` records whose payload is
the raw HTTP response (status line + headers + HTML body); the text a
WET file carries is EXTRACTED from these.  Reading raw WARC is the most
common ingest a 100 TB pretraining pipeline runs that extracted-text
WET cannot serve: it keeps the HTTP status / content-type signals and
lets the pipeline own its HTML→text policy instead of inheriting the
crawl's.

Same scale shape as :mod:`plda_spark.sources.wet` (whose
Content-Length-exact record walker this module reuses — one parser
core, no drift): one task per gzip shard via ``binaryFile``, pure
stdlib inflate, corrupt WARC STRUCTURE fails loudly with file + byte
offset.  HTTP-level oddities inside a structurally-valid record degrade
gracefully instead (NULL status, raw body) — wild-crawl payloads are
routinely malformed, and one bad origin server must not kill a
100k-shard job the way upstream transfer loss should.

HTML→text extraction (:func:`extract_html_text`) is dependency-free
and runs as one Arrow ``mapInPandas`` pass (C-regex per batch, no JVM
round-trips): strip comments + script/style/noscript/template subtrees,
break on block-level tags, drop all remaining tags, THEN decode
entities (after tag removal, so ``&lt;script&gt;`` in user text can
never resurrect as markup), collapse horizontal whitespace, drop blank
lines.  The same policy as the common extractors' default mode
(resiliparse/trafilatura "basic"), chosen for determinism over
boilerplate-removal cleverness — boilerplate scoring belongs in the
curation operators where it is auditable.
"""

from __future__ import annotations

import gzip
import re
from collections.abc import Iterator
from html import unescape

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plda_spark.sources.wet import _inflate_chunks, walk_warc_records

__all__ = [
    "read_warc",
    "read_warc_stream",
    "write_warc",
    "extract_html_text",
    "extract_html_blocks",
    "drop_boilerplate",
    "wet_from_warc",
]

_WARC_SCHEMA = (
    "warc_file string, url string, warc_date string, http_status int, "
    "content_type string, content_length long, html string"
)

_CHARSET_RE = re.compile(r"charset=\"?'?([\w.\-]+)", re.I)


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP chunked transfer-encoded body.  Raises ValueError
    on malformed chunk framing (caller falls back to the raw bytes —
    HTTP-level damage degrades, it doesn't kill the shard)."""
    out, pos = [], 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            raise ValueError("unterminated chunk-size line")
        size = int(body[pos:nl].split(b";")[0].strip(), 16)
        if size == 0:
            return b"".join(out)
        start = nl + 2
        if start + size > len(body):
            raise ValueError("chunk overruns body")
        out.append(body[start : start + size])
        pos = start + size + 2  # skip the chunk's trailing CRLF


def _parse_http_response(payload: bytes) -> tuple:
    """Split one response-record payload into (status, content_type,
    html_text).  Lenient: a payload with no recognizable HTTP header
    block comes back as (None, None, utf-8-decoded payload)."""
    head_end = payload.find(b"\r\n\r\n")
    if head_end < 0 or not payload[:5].upper().startswith(b"HTTP/"):
        return None, None, payload.decode("utf-8", "replace")
    head_lines = payload[:head_end].decode("iso-8859-1").split("\r\n")
    status = None
    parts = head_lines[0].split()
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    http_headers: dict[str, str] = {}
    for line in head_lines[1:]:
        key, _, val = line.partition(":")
        http_headers[key.strip().lower()] = val.strip()
    body = payload[head_end + 4 :]
    if "chunked" in http_headers.get("transfer-encoding", "").lower():
        try:
            body = _dechunk(body)
        except ValueError:
            pass  # degrade: keep raw bytes (see module docstring)
    ctype = http_headers.get("content-type")
    codec = "utf-8"
    if ctype:
        m = _CHARSET_RE.search(ctype)
        if m:
            codec = m.group(1)
    try:
        html = body.decode(codec, "replace")
    except LookupError:  # unknown charset label from a wild server
        html = body.decode("utf-8", "replace")
    return status, ctype, html


def _parse_warc_bytes(data: bytes | "Iterator[bytes]", src: str) -> Iterator[tuple]:
    """One (decompressed) raw-WARC shard → (url, warc_date, http_status,
    content_type, content_length, html) per ``response`` record.
    warcinfo/request/metadata records are skipped.  WARC structure
    errors raise (via the shared walker); HTTP oddities degrade."""
    for headers, body in walk_warc_records(data, src):
        if headers.get("warc-type") != "response":
            continue
        status, ctype, html = _parse_http_response(body)
        yield (
            headers.get("warc-target-uri", ""),
            headers.get("warc-date", ""),
            status,
            ctype,
            len(body),
            html,
        )


def _parse_shards(files: DataFrame) -> DataFrame:
    """(path, content) binary rows → parsed response records (shared by
    the batch and streaming readers — one parser, no drift)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                if data[:2] == b"\x1f\x8b":
                    # streamed inflate (wet._inflate_chunks): peak task
                    # memory is O(record), not O(decompressed shard)
                    rows = list(
                        _parse_warc_bytes(_inflate_chunks(data), str(fpath))
                    )
                else:
                    rows = list(_parse_warc_bytes(data, str(fpath)))
                yield pd.DataFrame(
                    {
                        "warc_file": [str(fpath)] * len(rows),
                        "url": [r[0] for r in rows],
                        "warc_date": [r[1] for r in rows],
                        "http_status": pd.array(
                            [r[2] for r in rows], dtype="Int32"
                        ),
                        "content_type": [r[3] for r in rows],
                        "content_length": pd.array(
                            [r[4] for r in rows], dtype="int64"
                        ),
                        "html": [r[5] for r in rows],
                    }
                )

    return files.select("path", "content").mapInPandas(parse, schema=_WARC_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Raw WARC shards → ``(warc_file, url, warc_date, http_status,
    content_type, content_length, html)``, one row per ``response``
    record.  One task per shard (``binaryFile``), gzip sniffed by magic
    bytes; see the module docstring for the scale rationale.  Chain
    :func:`extract_html_text` for the text column."""
    return _parse_shards(spark.read.format("binaryFile").load(path))


def read_warc_stream(spark: SparkSession, path: str) -> DataFrame:
    """STREAMING raw-WARC reader: watch a directory for newly-landed
    shards and emit parsed response records incrementally — identical
    parser and schema to :func:`read_warc` (shared code path).  Chain
    ``extract_html_text`` then the incremental dedup ledgers for the
    exactly-once crawl-ingest pipeline, exactly like the WET twin."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .load(path)
    )
    return _parse_shards(files)


# --- HTML -> text -----------------------------------------------------

_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_DROP_SUBTREE_RE = re.compile(
    r"(?is)<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>"
)
_BLOCK_TAG_RE = re.compile(
    r"(?i)</?(p|div|br|li|ul|ol|dl|dt|dd|h[1-6]|tr|td|th|table|thead|tbody"
    r"|blockquote|pre|hr|form|section|article|aside|nav|header|footer"
    r"|figure|figcaption|title|option|select)\b[^>]*>"
)
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_HWS_RE = re.compile(r"[ \t\r\f\v ]+")


def html_to_text(html: str) -> str:
    """Dependency-free HTML→text (module docstring has the policy).
    Plain-Python single-string form; the Spark operator is
    :func:`extract_html_text`."""
    s = _COMMENT_RE.sub(" ", html)
    s = _DROP_SUBTREE_RE.sub(" ", s)
    s = _BLOCK_TAG_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = unescape(s)  # AFTER tag removal: entities can never become markup
    lines = (_HWS_RE.sub(" ", ln).strip() for ln in s.split("\n"))
    return "\n".join(ln for ln in lines if ln)


_LINK_RE = re.compile(r"(?i)<a[\s>]")


def html_to_blocks(html: str) -> list[tuple[str, int, int]]:
    """HTML → ``[(block_text, n_words, n_links)]`` — the block-level
    decomposition boilerplate classifiers run on (jusText, Kohlschütter
    boilerpipe): comments and script/style subtrees dropped, the page
    split at block-level tags, anchor tags counted PER BLOCK before
    stripping (the link-density signal), then each block tag-stripped,
    entity-decoded, and whitespace-collapsed.  Empty blocks vanish.
    Concatenating the block texts with newlines equals
    :func:`html_to_text` on the same page (one decomposition, two
    views)."""
    s = _COMMENT_RE.sub(" ", html)
    s = _DROP_SUBTREE_RE.sub(" ", s)
    out = []
    for seg in _BLOCK_TAG_RE.sub("\n", s).split("\n"):
        n_links = len(_LINK_RE.findall(seg))
        txt = _HWS_RE.sub(" ", unescape(_TAG_RE.sub(" ", seg))).strip()
        if txt:
            out.append((txt, len(txt.split()), n_links))
    return out


def extract_html_blocks(
    docs: DataFrame,
    html_col: str = "html",
    id_col: str = "url",
) -> DataFrame:
    """Per-block decomposition of an HTML column: one output row per
    non-empty block — ``(id_col, block_idx, text, n_words, n_links,
    link_density)``, where ``link_density`` is anchors per word (the
    classic boilerplate signal: navigation/footer chrome is link-dense,
    body prose is not).  ONE Arrow ``mapInPandas`` pass, embarrassingly
    parallel — no shuffle; at 100 TB this is a pure scan stage."""
    if html_col not in docs.columns:
        raise ValueError(f"extract_html_blocks: no column {html_col!r}")
    id_field = docs.schema[id_col]
    schema = (
        f"{id_col} {id_field.dataType.simpleString()}, block_idx int, "
        "text string, n_words int, n_links int, link_density double"
    )

    def blocks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    (id_col, "block_idx", "text", "n_words", "n_links",
                     "link_density")}
            for key, h in zip(pdf[id_col], pdf[html_col]):
                if h is None:
                    continue
                for i, (txt, nw, nl) in enumerate(html_to_blocks(h)):
                    rows[id_col].append(key)
                    rows["block_idx"].append(i)
                    rows["text"].append(txt)
                    rows["n_words"].append(nw)
                    rows["n_links"].append(nl)
                    rows["link_density"].append(round(nl / max(nw, 1), 4))
            yield pd.DataFrame(rows)

    return docs.select(id_col, html_col).mapInPandas(blocks, schema=schema)


def drop_boilerplate(
    docs: DataFrame,
    html_col: str = "html",
    id_col: str = "url",
    max_link_density: float = 0.25,
    min_words: int = 1,
    out_col: str = "text",
) -> DataFrame:
    """Main-content extraction: decompose into blocks
    (:func:`extract_html_blocks`), DROP link-dense chrome (navigation,
    footers, related-links rails: ``link_density > max_link_density``)
    and sub-``min_words`` fragments, and reassemble the survivors in
    document order — ``(id_col, out_col)``, one row per page that kept
    any content.  The simplified jusText recipe: link density is the
    dominant published signal; stopword-density refinement belongs in
    the auditable curation operators downstream (``operators.text``
    quality scoring runs on this output).

    Block scoring is per-row work inside the same Arrow pass as the
    decomposition; the only shuffle is the per-page reassembly
    aggregation (sort_array over (block_idx, text) structs — exact
    document order, no window)."""
    blocks = extract_html_blocks(docs, html_col, id_col)
    good = blocks.where(
        (F.col("link_density") <= max_link_density)
        & (F.col("n_words") >= min_words)
    )
    return (
        good.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("block_idx", "text"))
                    ),
                    lambda s: s["text"],
                ),
                "\n",
            ).alias(out_col)
        )
    )


def extract_html_text(
    docs: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """Append ``out_col`` = extracted text of ``html_col`` — ONE Arrow
    ``mapInPandas`` pass, C-regex per batch, all other columns carried
    through unchanged.  NULL html extracts to NULL (not empty string),
    so a missing payload stays distinguishable from an empty page."""
    if html_col not in docs.columns:
        raise ValueError(f"extract_html_text: no column {html_col!r}")
    from pyspark.sql.types import StringType, StructField, StructType

    # a fresh StructType — StructType.add would MUTATE the DataFrame's
    # cached schema object and corrupt docs.columns
    out_schema = StructType(
        list(docs.schema.fields) + [StructField(out_col, StringType(), True)]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = pdf[html_col].map(
                lambda h: None if h is None else html_to_text(h)
            )
            yield pdf

    return docs.mapInPandas(extract, schema=out_schema)


def write_warc(
    docs: DataFrame,
    path: str,
    html_col: str = "html",
    id_col: str = "doc_id",
    url_prefix: str = "http://corpus.local/",
    warc_date: str = "2024-01-01T00:00:00Z",
    content_type: str = "text/html; charset=utf-8",
    compress: bool = False,
) -> None:
    """Render docs as WARC ``response`` records (status line + HTTP
    headers + HTML body) through the distributed text sink — the
    write-side twin the round-trip tests and the test-fixture path
    need, same recipe as :func:`plda_spark.sources.wet.write_wet`.
    Both Content-Lengths (HTTP and WARC) are ``octet_length`` UTF-8
    BYTES of the exact payload the reader will walk.  NULL id/html
    raises executor-side rather than silently dropping a record."""
    poison = F.raise_error(
        F.concat(
            F.lit("write_warc: NULL "),
            F.when(F.col(html_col).isNull(), F.lit(html_col)).otherwise(F.lit(id_col)),
            F.lit(" for doc_id="),
            F.coalesce(F.col(id_col).cast("string"), F.lit("NULL")),
            F.lit(" — WARC records cannot represent missing documents; "
                  "filter or fill upstream"),
        )
    )
    http_head = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: "),
        F.lit(content_type),
        F.lit("\r\nContent-Length: "),
        F.octet_length(F.col(html_col)).cast("string"),
        F.lit("\r\n\r\n"),
    )
    payload_len = F.octet_length(http_head) + F.octet_length(F.col(html_col))
    record = F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit("WARC-Type: response\r\n"),
        F.lit("WARC-Target-URI: "),
        F.lit(url_prefix),
        F.col(id_col).cast("string"),
        F.lit("\r\n"),
        F.lit("WARC-Date: "),
        F.lit(warc_date),
        F.lit("\r\n"),
        F.lit("Content-Type: application/http; msgtype=response\r\n"),
        F.lit("Content-Length: "),
        payload_len.cast("string"),
        F.lit("\r\n\r\n"),
        http_head,
        F.col(html_col),
        F.lit("\r\n"),
    )
    guarded = F.when(
        F.col(html_col).isNull() | F.col(id_col).isNull(), poison
    ).otherwise(record)
    writer = docs.select(guarded.alias("value")).write.option("lineSep", "\r\n")
    if compress:
        writer = writer.option("compression", "gzip")
    writer.mode("overwrite").text(path)


def wet_from_warc(
    spark: SparkSession,
    warc_path: str,
    wet_path: str,
    boilerplate: bool = True,
    min_status: int = 200,
    max_status: int = 299,
    compress: bool = True,
) -> None:
    """The Common Crawl derivation job itself: raw ``.warc.gz``
    response shards → extracted-text WET shards.  Reads with
    :func:`read_warc`, keeps 2xx HTML-ish responses (NULL status — a
    payload with no parseable HTTP head — is kept: at crawl scale that
    is usually a stripped-header capture, and dropping silently would
    make corpus counts irreproducible; filter on ``http_status`` first
    if stricter), extracts text (:func:`drop_boilerplate` by default,
    plain :func:`extract_html_text` with ``boilerplate=False``), and
    renders WET conversion records via
    :func:`plda_spark.sources.wet.write_wet` keyed by the original
    URL.  End to end this is scan → per-row extraction → distributed
    text write; the only shuffle is drop_boilerplate's reassembly
    aggregation."""
    from plda_spark.sources.wet import write_wet

    recs = read_warc(spark, warc_path)
    ok = recs.where(
        F.col("http_status").isNull()
        | F.col("http_status").between(min_status, max_status)
    )
    if boilerplate:
        texts = drop_boilerplate(ok, id_col="url")
    else:
        texts = extract_html_text(ok).select("url", "text").where(
            F.length("text") > 0
        )
    write_wet(texts, wet_path, id_col="url", url_prefix="", compress=compress)
