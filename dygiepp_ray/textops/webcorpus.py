"""Web-corpus ingestion operators — the Common-Crawl-shaped front end
of a training-data pipeline: HTML text extraction, URL/domain
statistics, WARC container parsing and RFC-822 email parsing.

Reference analogue: the reference ingests standoff/XML corpora through
format-faithful parsers (``reference/dygie/data/dataset_readers``,
``scripts/data/ace05/parse_ace_event.py``); these stages do the same
for the web formats a 100-TB crawl corpus actually arrives in.  Every
op is a map-only batch transform (no shuffle): HTML/WARC/EML decode is
inherently per-document work, so each stage is the actor-pool decode
shape (csv_docs / tar_members pattern, ``sources/csvfile.py``).

Oracle strategy: the HTML and URL ops derive their input from the
``documents`` table in BOTH engines (the wrap rule is shared, the
PARSE is what the engine is graded on — html.parser / urllib.parse
here, string reconstruction in SQL).  WARC and EML synthesize md5-
chain payloads so the SQL twin regenerates every record without
parsing the container (the tarball.py convention); the WARC payloads
embed a fake record header mid-payload so a naive delimiter-split
reader desynchronizes and fails the hash match.
"""

from __future__ import annotations

import hashlib
import html as _html
import io
from html.parser import HTMLParser

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _hexval(s: str) -> int:
    return int(s, 16)


def _sql_hexval(expr: str, start: int, nchars: int) -> str:
    """SQL twin of int(expr[start-1:start-1+n], 16) (1-based start)."""
    return "(" + " + ".join(
        f"(strpos('0123456789abcdef', substr({expr}, {start + i}, 1)) - 1)"
        f" * {16 ** (nchars - 1 - i)}"
        for i in range(nchars)
    ) + ")"


# ---------------------------------------------------------------------------
# HTML text extraction
# ---------------------------------------------------------------------------


def synth_html(doc_id: int, source: str, text: str) -> str:
    """Deterministic HTML wrap of a document (title + h1 + one bolded
    leading token + comment + script/style distractors).  Text is
    entity-escaped on the way in; the parser's charref conversion
    restores it, so extraction round-trips exactly."""
    esc = _html.escape(str(text))
    head, sep, rest = esc.partition(" ")
    body = f"<b>{head}</b>{sep}{rest}" if esc else ""
    return (
        f"<html><head><title>Doc {doc_id}</title>"
        "<style>p{margin:0}</style>"
        f"<script>var id={doc_id};</script></head>"
        f"<body><h1>{source}</h1><p>{body}</p>"
        f"<!-- crawl:{doc_id} --></body></html>"
    )


class _TextExtractor(HTMLParser):
    """Collect text nodes, dropping script/style content and comments
    (the trafilatura-lite extraction contract)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style"):
            self._skip += 1

    def handle_endtag(self, tag):
        if tag in ("script", "style"):
            self._skip = max(0, self._skip - 1)

    def handle_data(self, data):
        if not self._skip:
            self.parts.append(data)


def extract_text(html_doc: str) -> str:
    """Real HTML parse -> whitespace-normalized visible text (ASCII
    whitespace collapse, the regexp_replace('\\s+',' ') convention the
    SQL twin uses)."""
    p = _TextExtractor()
    p.feed(html_doc)
    p.close()
    return " ".join(" ".join(p.parts).split())


class HtmlExtract:
    """Actor-pool stage: wrap each document row in the deterministic
    HTML shell, then run the REAL extraction parse back to text."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": [], "source": [], "n_chars": [], "text_md5": []}
        if len(df) == 0 or "doc_id" not in df.columns:
            return pd.DataFrame(out).astype(
                {"doc_id": np.int64, "n_chars": np.int64})
        for did, src, txt in zip(df["doc_id"], df["source"], df["text"]):
            doc = synth_html(int(did), str(src), str(txt))
            ext = extract_text(doc)
            out["doc_id"].append(int(did))
            out["source"].append(str(src))
            out["n_chars"].append(len(ext))
            out["text_md5"].append(hashlib.md5(ext.encode()).hexdigest())
        return pd.DataFrame(out).astype(
            {"doc_id": np.int64, "n_chars": np.int64})


def html_extract(docs: ray.data.Dataset,
                 concurrency: int = 2) -> ray.data.Dataset:
    return docs.map_batches(
        HtmlExtract, batch_format="pandas", concurrency=concurrency)


def q_html_extract(sf_dir: str) -> ray.data.Dataset:
    """HTML text extraction audit: every document is wrapped in a
    deterministic HTML shell (title/h1/bold/script/style/comment) and
    extracted back with a REAL html.parser walk; the twin reconstructs
    the expected visible text by string composition.  Any extraction
    bug (script leakage, comment leakage, entity mishandling,
    whitespace drift) breaks the per-doc hash."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "text"])
    return html_extract(docs)


SQL_HTML_EXTRACT = r"""
WITH x AS (
  SELECT doc_id, source,
         trim(regexp_replace(
             'Doc ' || doc_id || ' ' || source || ' ' || text,
             '\s+', ' ', 'g')) AS ext
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       CAST(length(ext) AS BIGINT) AS n_chars,
       md5(ext) AS text_md5
FROM x
"""


# ---------------------------------------------------------------------------
# URL parsing / domain statistics
# ---------------------------------------------------------------------------


class UrlHostPartial:
    """Per-batch partial: synthesize each document's crawl URL, REAL
    urlsplit parse, reduce to (domain, host, n, n_query) — bounded by
    the source x 4-subdomain vocabulary, however large the batch."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from urllib.parse import urlsplit

        empty = pd.DataFrame(
            {"domain": pd.Series(dtype=object),
             "host": pd.Series(dtype=object),
             "n": pd.Series(dtype=np.int64),
             "n_query": pd.Series(dtype=np.int64)})
        if len(df) == 0 or "doc_id" not in df.columns:
            return empty
        rows = {"domain": [], "host": [], "q": []}
        for did, src, lang in zip(df["doc_id"], df["source"], df["lang"]):
            h = hashlib.md5(f"url:{int(did)}".encode()).hexdigest()
            sub = f"s{_hexval(h[0]) % 4}"
            query = f"ref={lang}" if _hexval(h[1]) % 3 == 0 else ""
            url = (f"https://{sub}.{src}.example.org/d/{int(did)}"
                   + (f"?{query}" if query else ""))
            parts = urlsplit(url)  # the graded parse
            labels = parts.netloc.split(".")
            rows["domain"].append(".".join(labels[-3:]))
            rows["host"].append(parts.netloc)
            rows["q"].append(int(bool(parts.query)))
        g = pd.DataFrame(rows).groupby(
            ["domain", "host"], as_index=False).agg(
            n=("q", "size"), n_query=("q", "sum"))
        return g.astype({"n": np.int64, "n_query": np.int64})


def q_url_host_stats(sf_dir: str) -> pd.DataFrame:
    """Domain-level crawl statistics (the per-domain corpus census run
    before domain filtering): deterministic URL per document, REAL
    urllib.parse parse, rollup to registrable domain with distinct
    host counts.  Map-only partials over the tiny domain vocabulary;
    the driver folds O(domains x subdomains) rows."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "lang"])
    parts = docs.map_batches(
        UrlHostPartial, batch_format="pandas",
        concurrency=2).to_pandas()
    out_cols = {"domain": object, "n_urls": np.int64,
                "n_hosts": np.int64, "n_with_query": np.int64}
    if parts.empty or "domain" not in parts.columns:
        return pd.DataFrame(
            {c: pd.Series(dtype=t) for c, t in out_cols.items()})
    hosts = parts.groupby(["domain", "host"], as_index=False).agg(
        n=("n", "sum"), n_query=("n_query", "sum"))
    return hosts.groupby("domain", as_index=False).agg(
        n_urls=("n", "sum"), n_hosts=("host", "nunique"),
        n_with_query=("n_query", "sum")).astype(
        {"n_urls": np.int64, "n_hosts": np.int64,
         "n_with_query": np.int64})


SQL_URL_HOST_STATS = f"""
WITH u AS (
  SELECT doc_id, source, lang, md5('url:' || doc_id) AS h
  FROM documents
),
v AS (
  SELECT source || '.example.org' AS domain,
         's' || CAST({_sql_hexval('h', 1, 1)} % 4 AS VARCHAR)
           || '.' || source || '.example.org' AS host,
         CASE WHEN {_sql_hexval('h', 2, 1)} % 3 = 0 THEN 1 ELSE 0
           END AS hq
  FROM u
)
SELECT domain, CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
       CAST(sum(hq) AS BIGINT) AS n_with_query
FROM v GROUP BY domain
"""


# ---------------------------------------------------------------------------
# WARC container
# ---------------------------------------------------------------------------

WARC_SEED = 31


def _warc_content(i: int, seed: int = WARC_SEED) -> bytes:
    base = hashlib.md5(f"warc:{seed}:{i}".encode()).hexdigest()
    size = 40 + _hexval(base[0:3]) % 460
    chunks, j = [], 0
    while 32 * j < size:
        chunks.append(
            hashlib.md5(f"warc:{seed}:{i}:{j}".encode()).hexdigest())
        j += 1
    content = "".join(chunks)[:size]
    if i % 5 == 2:
        # integrity trap: a fake record header INSIDE the payload —
        # only Content-Length framing survives it
        content = content[:10] + "\r\n\r\nWARC/1.0\r\n" + content[10:]
    return content.encode("ascii")


def synth_warc(n_records: int, seed: int = WARC_SEED) -> pa.Table:
    """One-row (file_id, payload) table holding a REAL WARC 1.0 file:
    CRLF headers, Content-Length framing, double-CRLF record
    separators."""
    buf = io.BytesIO()
    for i in range(n_records):
        content = _warc_content(i, seed)
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: https://crawl.example.org/p/{i}\r\n"
            f"WARC-Record-ID: <urn:rec:{i}>\r\n"
            f"Content-Length: {len(content)}\r\n"
            "\r\n"
        ).encode("ascii")
        buf.write(hdr)
        buf.write(content)
        buf.write(b"\r\n\r\n")
    return pa.table({
        "file_id": pa.array([0], pa.int64()),
        "payload": pa.array([buf.getvalue()], pa.binary()),
    })


class WarcRecords:
    """Actor-pool stage: REAL WARC walk — parse header block, honor
    Content-Length, verify the version line — one row per record."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = {"file_id": [], "rec_idx": [], "uri": [],
                "content_length": [], "payload_md5": []}
        for fid, payload in zip(df["file_id"], df["payload"]):
            data = bytes(payload)
            pos, idx = 0, 0
            while pos < len(data):
                end = data.index(b"\r\n\r\n", pos)
                head = data[pos:end].decode("ascii")
                lines = head.split("\r\n")
                if lines[0] != "WARC/1.0":
                    raise ValueError(f"bad WARC version line: {lines[0]!r}")
                fields = dict(
                    ln.split(": ", 1) for ln in lines[1:] if ln)
                clen = int(fields["Content-Length"])
                body = data[end + 4:end + 4 + clen]
                if len(body) != clen:
                    raise ValueError("truncated WARC record")
                rows["file_id"].append(int(fid))
                rows["rec_idx"].append(idx)
                rows["uri"].append(fields["WARC-Target-URI"])
                rows["content_length"].append(clen)
                rows["payload_md5"].append(
                    hashlib.md5(body).hexdigest())
                pos = end + 4 + clen + 4  # trailing CRLFCRLF
                idx += 1
        return pd.DataFrame(rows).astype(
            {"file_id": np.int64, "rec_idx": np.int64,
             "content_length": np.int64})


def warc_records(files: ray.data.Dataset,
                 concurrency: int = 2) -> ray.data.Dataset:
    return files.map_batches(
        WarcRecords, batch_format="pandas", batch_size=4,
        concurrency=concurrency)


def q_warc_records(sf_dir: str) -> ray.data.Dataset:
    """REAL WARC 1.0 parsing (header walk + Content-Length framing);
    every 5th-ish payload embeds a fake record header, so delimiter-
    split readers desynchronize.  The twin regenerates (uri, length,
    md5) from the chain rule without touching the container."""
    return warc_records(ray.data.from_arrow(synth_warc(24)))


def _sql_warc_records() -> str:
    return f"""
WITH m AS (
  SELECT i, md5('warc:{WARC_SEED}:' || i) AS base FROM range(0, 24) t(i)
),
d AS (SELECT i, 40 + {_sql_hexval('base', 1, 3)} % 460 AS size FROM m),
ch AS (
  SELECT d.i, d.size,
         string_agg(md5('warc:{WARC_SEED}:' || d.i || ':' || j.j), ''
                    ORDER BY j.j) AS chain
  FROM d, range(0, 16) j(j) GROUP BY d.i, d.size
),
c AS (
  SELECT i, size,
         CASE WHEN i % 5 = 2 THEN
           substring(chain, 1, 10) || chr(13) || chr(10) || chr(13)
           || chr(10) || 'WARC/1.0' || chr(13) || chr(10)
           || substring(substring(chain, 1, size), 11)
         ELSE substring(chain, 1, size) END AS content
  FROM ch
)
SELECT CAST(0 AS BIGINT) AS file_id, CAST(i AS BIGINT) AS rec_idx,
       'https://crawl.example.org/p/' || i AS uri,
       CAST(length(content) AS BIGINT) AS content_length,
       md5(content) AS payload_md5
FROM c
"""


# ---------------------------------------------------------------------------
# RFC-822 / MIME email
# ---------------------------------------------------------------------------

EML_SEED = 37


def _eml_part(i: int, p: int, seed: int = EML_SEED) -> str:
    base = hashlib.md5(f"eml:{seed}:{i}:{p}".encode()).hexdigest()
    size = 20 + _hexval(base[0:2]) % 200
    chunks, j = [], 0
    while 32 * j < size:
        chunks.append(
            hashlib.md5(f"eml:{seed}:{i}:{p}:{j}".encode()).hexdigest())
        j += 1
    return "".join(chunks)[:size]


def synth_eml(n: int, seed: int = EML_SEED) -> pa.Table:
    """(msg_id, payload): REAL RFC-822 messages — one third single-part
    text/plain, the rest multipart/mixed with 2-3 parts behind a MIME
    boundary.  Bodies are md5 chains, so the twin regenerates them."""
    ids, payloads = [], []
    for i in range(n):
        base = hashlib.md5(f"eml:{seed}:{i}".encode()).hexdigest()
        n_parts = 1 + _hexval(base[0]) % 3
        subject = "Re: " + base[:12]
        hdr = (f"From: agent{i % 7}@example.org\n"
               "To: corpus@example.org\n"
               f"Subject: {subject}\n"
               "MIME-Version: 1.0\n")
        if n_parts == 1:
            # no trailing newline -> parsed payload == body exactly
            msg = hdr + "Content-Type: text/plain\n\n" + _eml_part(i, 0)
        else:
            boundary = "b" + base[12:20]
            msg = hdr + (f'Content-Type: multipart/mixed; '
                         f'boundary="{boundary}"\n\n')
            for p in range(n_parts):
                msg += (f"--{boundary}\nContent-Type: text/plain\n\n"
                        f"{_eml_part(i, p)}\n")
            msg += f"--{boundary}--\n"
        ids.append(i)
        payloads.append(msg.encode("ascii"))
    return pa.table({
        "msg_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    })


class EmlHeaders:
    """Actor-pool stage: REAL stdlib email parse (header fields + MIME
    multipart walk) -> (msg_id, n_parts, subject, body_md5,
    body_bytes); body = leaf payloads concatenated in walk order."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import email

        rows = {"msg_id": [], "n_parts": [], "subject": [],
                "body_md5": [], "body_bytes": []}
        for mid, payload in zip(df["msg_id"], df["payload"]):
            m = email.message_from_string(
                bytes(payload).decode("ascii"))
            leaves = [q for q in m.walk() if not q.is_multipart()]
            body = "".join(q.get_payload() for q in leaves)
            rows["msg_id"].append(int(mid))
            rows["n_parts"].append(len(leaves))
            rows["subject"].append(m["Subject"])
            rows["body_md5"].append(
                hashlib.md5(body.encode("ascii")).hexdigest())
            rows["body_bytes"].append(len(body))
        return pd.DataFrame(rows).astype(
            {"msg_id": np.int64, "n_parts": np.int64,
             "body_bytes": np.int64})


def eml_headers(msgs: ray.data.Dataset,
                concurrency: int = 2) -> ray.data.Dataset:
    return msgs.map_batches(
        EmlHeaders, batch_format="pandas", batch_size=8,
        concurrency=concurrency)


def q_eml_headers(sf_dir: str) -> ray.data.Dataset:
    """REAL RFC-822/MIME parsing (header fields, multipart boundary
    walk, single-vs-multipart payload conventions); the twin
    regenerates subject/body from the chain rule without parsing."""
    return eml_headers(ray.data.from_arrow(synth_eml(36)))


def _sql_eml_headers() -> str:
    # part sizes: 20 + hexval(md5(eml:seed:i:p)[0:2]) % 200  (<= 219
    # chars -> 7 chain chunks cover any part)
    return f"""
WITH m AS (
  SELECT i, md5('eml:{EML_SEED}:' || i) AS base FROM range(0, 36) t(i)
),
h AS (SELECT i, base, 1 + {_sql_hexval('base', 1, 1)} % 3 AS n_parts FROM m),
p AS (
  SELECT h.i, h.n_parts, h.base, q.p,
         md5('eml:{EML_SEED}:' || h.i || ':' || q.p) AS pbase
  FROM h, range(0, 3) q(p) WHERE q.p < h.n_parts
),
sz AS (SELECT i, n_parts, base, p, pbase,
              20 + {_sql_hexval('pbase', 1, 2)} % 200 AS size FROM p),
ch AS (
  SELECT sz.i, sz.n_parts, sz.base, sz.p, sz.size,
         string_agg(
             md5('eml:{EML_SEED}:' || sz.i || ':' || sz.p || ':' || j.j),
             '' ORDER BY j.j) AS chain
  FROM sz, range(0, 7) j(j) GROUP BY sz.i, sz.n_parts, sz.base, sz.p, sz.size
),
b AS (
  SELECT i, n_parts, base,
         string_agg(substring(chain, 1, size), '' ORDER BY p) AS body
  FROM ch GROUP BY i, n_parts, base
)
SELECT CAST(i AS BIGINT) AS msg_id,
       CAST(n_parts AS BIGINT) AS n_parts,
       'Re: ' || substring(base, 1, 12) AS subject,
       md5(body) AS body_md5,
       CAST(length(body) AS BIGINT) AS body_bytes
FROM b
"""


RSS_SEED = 17


def synth_rss(n: int, seed: int = RSS_SEED) -> pa.Table:
    """(feed_id, payload): REAL RSS 2.0 XML feeds.  Item titles are
    md5 chains with a deterministic '&x' suffix on even-nibble items
    (escaped to ``&amp;x`` on the wire — the parse must unescape), and
    description lengths derive from the chain, so the SQL twin
    regenerates every per-feed statistic without an XML parser."""
    ids, payloads = [], []
    for i in range(n):
        base = hashlib.md5(f"rss:{seed}:{i}".encode()).hexdigest()
        k = 3 + _hexval(base[0]) % 6
        items = []
        for j in range(k):
            t = hashlib.md5(f"rss:{seed}:{i}:{j}:t".encode()).hexdigest()
            if _hexval(t[0]) % 2 == 0:
                title = t + "&x"
            else:
                title = t
            dlen = 20 + int(hashlib.md5(
                f"rss:{seed}:{i}:{j}:d".encode()).hexdigest()[:2], 16) % 200
            desc = (hashlib.md5(
                f"rss:{seed}:{i}:{j}:dc".encode()).hexdigest() * 7)[:dlen]
            esc = title.replace("&", "&amp;")
            items.append(
                f"<item><title>{esc}</title>"
                f"<link>https://example.org/{t[:8]}</link>"
                f"<description>{desc}</description></item>")
        xml = ("<?xml version=\"1.0\"?>\n<rss version=\"2.0\"><channel>"
               f"<title>feed {i}</title>" + "".join(items)
               + "</channel></rss>")
        ids.append(i)
        payloads.append(xml.encode("ascii"))
    return pa.table({
        "feed_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    })


class RssEntries:
    """Actor-pool stage: REAL xml.etree parse of RSS 2.0 feeds ->
    (feed_id, n_items, titles_md5, desc_bytes); titles_md5 hashes the
    UNESCAPED titles concatenated in document order."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import xml.etree.ElementTree as ET

        _OUT = {"feed_id": np.int64, "n_items": np.int64,
                "titles_md5": object, "desc_bytes": np.int64}
        if len(df) == 0 or "feed_id" not in df.columns:
            return pd.DataFrame({c: pd.Series(dtype=t)
                                 for c, t in _OUT.items()})
        rows = {c: [] for c in _OUT}
        for fid, payload in zip(df["feed_id"], df["payload"]):
            root = ET.fromstring(bytes(payload).decode("ascii"))
            items = root.findall("./channel/item")
            titles = [it.findtext("title") or "" for it in items]
            descs = [it.findtext("description") or "" for it in items]
            rows["feed_id"].append(int(fid))
            rows["n_items"].append(len(items))
            rows["titles_md5"].append(
                hashlib.md5("".join(titles).encode("ascii")).hexdigest())
            rows["desc_bytes"].append(sum(len(d) for d in descs))
        return pd.DataFrame(rows).astype(
            {"feed_id": np.int64, "n_items": np.int64,
             "desc_bytes": np.int64})


def rss_entries(feeds: ray.data.Dataset,
                concurrency: int = 2) -> ray.data.Dataset:
    return feeds.map_batches(
        RssEntries, batch_format="pandas", batch_size=8,
        concurrency=concurrency)


def q_rss_entries(sf_dir: str) -> ray.data.Dataset:
    """REAL RSS 2.0 parse (channel/item tree walk, entity unescape);
    the twin regenerates titles/description lengths from the chain
    rule without an XML parser."""
    return rss_entries(ray.data.from_arrow(synth_rss(24)))


def _sql_rss_entries() -> str:
    return f"""
WITH m AS (
  SELECT i, md5('rss:{RSS_SEED}:' || i) AS base FROM range(0, 24) t(i)
),
h AS (SELECT i, 3 + {_sql_hexval('base', 1, 1)} % 6 AS k FROM m),
it AS (
  SELECT h.i, q.j,
         md5('rss:{RSS_SEED}:' || h.i || ':' || q.j || ':t') AS t
  FROM h, range(0, 9) q(j) WHERE q.j < h.k
),
ti AS (
  SELECT i, j,
         CASE WHEN ({_sql_hexval('t', 1, 1)}) % 2 = 0
              THEN t || '&x' ELSE t END AS title,
         20 + {_sql_hexval(
             "md5('rss:" + str(RSS_SEED) + ":' || i || ':' || j || ':d')",
             1, 2)} % 200 AS dlen
  FROM it
)
SELECT CAST(i AS BIGINT) AS feed_id,
       CAST(count(*) AS BIGINT) AS n_items,
       md5(string_agg(title, '' ORDER BY j)) AS titles_md5,
       CAST(sum(dlen) AS BIGINT) AS desc_bytes
FROM ti GROUP BY i
"""


ROBOTS_SEED = 23


def synth_robots(n: int, seed: int = ROBOTS_SEED) -> pa.Table:
    """(file_id, payload): REAL robots.txt files — comment lines,
    mixed-case directives, a User-agent: * group with Disallow rules
    (even-nibble rules also carry a more specific Allow), plus a
    decoy group for another agent that a correct parser must skip.
    Rule paths and probe URLs are md5-derived, so the SQL twin
    regenerates the longest-match evaluation without parsing."""
    ids, payloads = [], []
    for i in range(n):
        base = hashlib.md5(f"robots:{seed}:{i}".encode()).hexdigest()
        k = 2 + _hexval(base[0]) % 4
        lines = ["# synthetic robots corpus",
                 "User-agent: decoybot", "Disallow: /",
                 "", "User-Agent: *"]
        for j in range(k):
            p = "/p" + hashlib.md5(
                f"robots:{seed}:{i}:r:{j}".encode()).hexdigest()[:4] + "/"
            lines.append(f"Disallow: {p}")
            if _hexval(p[2]) % 2 == 0:
                lines.append(f"Allow: {p}pub")
        ids.append(i)
        payloads.append(("\n".join(lines) + "\n").encode("ascii"))
    return pa.table({
        "file_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    })


class RobotsAudit:
    """Actor-pool stage: REAL robots.txt parse (comments, blank-line
    group splits, case-insensitive directives, User-agent: * group
    selection) -> longest-match evaluation of 8 md5-derived probe
    URLs per file (ties prefer Allow — the Google convention).
    -> (file_id, n_rules, n_urls, n_allowed)."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        _OUT = {"file_id": np.int64, "n_rules": np.int64,
                "n_urls": np.int64, "n_allowed": np.int64}
        if len(df) == 0 or "file_id" not in df.columns:
            return pd.DataFrame({c: pd.Series(dtype=t)
                                 for c, t in _OUT.items()})
        rows = {c: [] for c in _OUT}
        for fid, payload in zip(df["file_id"], df["payload"]):
            rules = []  # (path, is_allow) for User-agent: *
            agents: list[str] = []
            in_star = False
            for raw in bytes(payload).decode("ascii").splitlines():
                line = raw.split("#", 1)[0].strip()
                if not line:
                    agents = []
                    continue
                key, _, val = line.partition(":")
                key, val = key.strip().lower(), val.strip()
                if key == "user-agent":
                    agents.append(val)
                    in_star = "*" in agents
                elif key in ("allow", "disallow") and in_star and val:
                    rules.append((val, key == "allow"))
                    agents = ["*"]  # rules end the agent header run
            n_allowed = 0
            n_urls = 8
            for j in range(n_urls):
                h = hashlib.md5(
                    f"robots:{ROBOTS_SEED}:{int(fid)}:u:{j}".encode()
                ).hexdigest()
                rp = "/p" + hashlib.md5(
                    f"robots:{ROBOTS_SEED}:{int(fid)}:r:{j % max(1, len([r for r in rules if not r[1]]))}".encode()
                ).hexdigest()[:4] + "/"
                url = rp + ("pub" if _hexval(h[0]) % 2 == 0 else "item")
                best_len, best_allow = -1, True
                for path, is_allow in rules:
                    if url.startswith(path):
                        if (len(path) > best_len
                                or (len(path) == best_len and is_allow)):
                            best_len, best_allow = len(path), is_allow
                n_allowed += int(best_allow)
            rows["file_id"].append(int(fid))
            rows["n_rules"].append(len(rules))
            rows["n_urls"].append(n_urls)
            rows["n_allowed"].append(n_allowed)
        return pd.DataFrame(rows).astype(_OUT)


def q_robots_audit(sf_dir: str) -> ray.data.Dataset:
    """REAL robots.txt parsing + longest-match URL evaluation; the
    twin regenerates rules and probe URLs from the chain rule."""
    return ray.data.from_arrow(synth_robots(24)).map_batches(
        RobotsAudit, batch_format="pandas", batch_size=8, concurrency=2)


def _sql_robots_audit() -> str:
    return f"""
WITH m AS (
  SELECT i, md5('robots:{ROBOTS_SEED}:' || i) AS base
  FROM range(0, 24) t(i)
),
h AS (SELECT i, 2 + {_sql_hexval('base', 1, 1)} % 4 AS k FROM m),
dr AS (
  SELECT h.i, q.j,
         '/p' || substr(md5('robots:{ROBOTS_SEED}:' || h.i
                            || ':r:' || q.j), 1, 4) || '/' AS path
  FROM h, range(0, 6) q(j) WHERE q.j < h.k
),
rules AS (
  SELECT i, path, FALSE AS is_allow FROM dr
  UNION ALL
  SELECT i, path || 'pub', TRUE FROM dr
  WHERE (strpos('0123456789abcdef', substr(path, 3, 1)) - 1) % 2 = 0
),
nr AS (SELECT i, count(*) AS n_rules FROM rules GROUP BY i),
urls AS (
  SELECT h.i, q.j,
         '/p' || substr(md5('robots:{ROBOTS_SEED}:' || h.i || ':r:'
                            || (q.j % h.k)), 1, 4) || '/'
         || CASE WHEN ({_sql_hexval(
             "md5('robots:" + str(ROBOTS_SEED)
             + ":' || h.i || ':u:' || q.j)", 1, 1)}) % 2 = 0
                 THEN 'pub' ELSE 'item' END AS url
  FROM h, range(0, 8) q(j)
),
match AS (
  SELECT u.i, u.j, r.is_allow,
         row_number() OVER (PARTITION BY u.i, u.j
                            ORDER BY length(r.path) DESC,
                                     r.is_allow DESC) AS rn
  FROM urls u JOIN rules r
    ON r.i = u.i AND starts_with(u.url, r.path)
),
verdict AS (
  SELECT u.i, u.j,
         COALESCE(mx.is_allow, TRUE) AS allowed
  FROM urls u LEFT JOIN (SELECT * FROM match WHERE rn = 1) mx
    ON mx.i = u.i AND mx.j = u.j
)
SELECT CAST(v.i AS BIGINT) AS file_id,
       CAST(nr.n_rules AS BIGINT) AS n_rules,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(CASE WHEN v.allowed THEN 1 ELSE 0 END) AS BIGINT)
         AS n_allowed
FROM verdict v JOIN nr ON nr.i = v.i
GROUP BY 1, 2
"""
