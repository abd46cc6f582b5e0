"""Source connectors: brat standoff (S7/M12/A8), ChemProt-style TSV
(S8/J3/F9), documents-as-transcripts adapter (S6)."""

import pandas as pd
import pytest

import ray.data as rd

from dygiepp_ray.sources.brat import drop_counters, parse_brat_doc, read_brat
from dygiepp_ray.sources.transcripts import documents_as_transcripts
from dygiepp_ray.sources.tsv import read_chemprot_style

TXT = "acme corp acquires spark today"
ANN = """T1\tORG 0 9\tacme corp
T2\tTOOL 19 24\tspark
T3\tBAD 2 7\tme co
R1\tacquires Arg1:T1 Arg2:T2
R2\tbogus Arg1:T3 Arg2:T2
E1\tacquire:T2 Agent:T1
*\tCOREF T1 T2
"""


def test_parse_brat_doc_alignment_and_drops():
    d = parse_brat_doc("d1", TXT, ANN)
    assert d["tokens"] == ["acme", "corp", "acquires", "spark", "today"]
    assert d["ner"] == [
        {"start": 0, "end": 1, "label": "ORG"},
        {"start": 3, "end": 3, "label": "TOOL"},
    ]
    assert d["relations"] == [
        {"s1": 0, "e1": 1, "s2": 3, "e2": 3, "label": "acquires"}
    ]
    assert d["dropped_entities"] == 1   # T3 misaligned (M12)
    assert d["dropped_relations"] == 1  # R2 references dropped T3
    assert d["events"][0]["event_type"] == "acquire"
    assert d["events"][0]["args"] == [{"start": 0, "end": 1, "role": "Agent"}]
    assert d["clusters"] == [
        [{"start": 0, "end": 1}, {"start": 3, "end": 3}]
    ]


def test_read_brat_dataset_and_counters(ray_session):
    pairs = rd.from_items(
        [
            {"doc_key": "d1", "txt": TXT, "ann": ANN},
            {"doc_key": "d2", "txt": "spark runs", "ann": "T1\tTOOL 0 5\tspark\n"},
        ]
    )
    parsed = read_brat(pairs)
    pdf = parsed.to_pandas().set_index("doc_key")
    assert list(pdf.loc["d2", "tokens"]) == ["spark", "runs"]
    counters = drop_counters(read_brat(pairs))
    assert counters["entities"] == 1 and counters["relations"] == 1


def test_chemprot_style_join(ray_session):
    abstracts = rd.from_pandas(
        pd.DataFrame(
            {"doc_key": ["a1", "a2"], "text": ["gene alpha binds drug beta", "no entities here"]}
        )
    )
    entities = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_key": ["a1", "a1", "a1"],
                "ent_id": ["T1", "T2", "T3"],
                "label": ["GENE-Y", "CHEMICAL", "GENE-N"],
                "start": [0, 17, 3],     # T3 misaligned (inside 'gene')
                "end": [10, 26, 7],
            }
        )
    )
    relations = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_key": ["a1", "a1"],
                "label": ["CPR:4", "CPR:9"],
                "arg1": ["Arg1:T1", "Arg1:T3"],
                "arg2": ["Arg2:T2", "Arg2:T2"],
            }
        )
    )
    out = read_chemprot_style(abstracts, entities, relations, num_buckets=2).to_pandas()
    out = out.set_index("doc_key")
    # GENE-Y -> GENE label rewrite (F9)
    assert {"start": 0, "end": 1, "label": "GENE"} in [dict(x) for x in out.loc["a1", "ner"]]
    assert [dict(x) for x in out.loc["a1", "relations"]] == [
        {"s1": 0, "e1": 1, "s2": 3, "e2": 4, "label": "CPR:4"}
    ]
    assert out.loc["a1", "dropped_entities"] == 1
    assert out.loc["a1", "dropped_relations"] == 1
    # abstract with no annotations still yields a doc row
    assert list(out.loc["a2", "ner"]) == []


def test_documents_as_transcripts_shape(ray_session):
    ds = documents_as_transcripts("/root/testdata/sf0.001")
    df = ds.to_pandas()
    assert set(df.columns) == {"conv_id", "turn_idx", "role", "text"}
    g = df[df.conv_id == "doc0"].sort_values("turn_idx")
    # turns are 16-token chunks except the last
    lens = g["text"].str.split().map(len)
    assert (lens.iloc[:-1] == 16).all() and lens.iloc[-1] <= 16


def test_xml_standoff_reader(ray_session):
    """Generic apf-like XML standoff source (S9/S10 pattern): entities,
    multi-mention coref clusters, relations, events, drop counters."""
    import ray.data as rd

    from dygiepp_ray.sources.brat import drop_counters
    from dygiepp_ray.sources.xmlstandoff import read_standoff_xml

    xml = """
    <corpus>
      <document doc_key="x1">
        <text>alice works at acme and alice likes robots</text>
        <entity id="e1" type="PER">
          <mention id="m1" start="0" end="5"/>
          <mention id="m2" start="24" end="29"/>
        </entity>
        <entity id="e2" type="ORG">
          <mention id="m3" start="15" end="19"/>
        </entity>
        <relation type="works_at" arg1="m1" arg2="m3"/>
        <event type="liking">
          <anchor start="30" end="35"/>
          <argument role="AGENT" mention="m2"/>
        </event>
      </document>
      <document doc_key="x2">
        <text>one two three</text>
        <entity id="e3" type="NUM">
          <mention id="m4" start="0" end="3"/>
          <mention id="m5" start="5" end="8"/>   <!-- 'wo ' misaligned: start 5 is mid-token -->
        </entity>
        <relation type="r" arg1="m4" arg2="m5"/>
      </document>
    </corpus>
    """
    ds = rd.from_items([{"doc_key": "ignored", "xml": xml}])
    out = read_standoff_xml(ds).to_pandas().set_index("doc_key")

    d1 = out.loc["x1"]
    assert list(d1["tokens"]) == "alice works at acme and alice likes robots".split()
    ner = {(m["start"], m["end"], m["label"]) for m in d1["ner"]}
    assert ner == {(0, 0, "PER"), (5, 5, "PER"), (3, 3, "ORG")}
    assert [dict(r) for r in d1["relations"]] == [
        {"s1": 0, "e1": 0, "s2": 3, "e2": 3, "label": "works_at"}
    ]
    assert d1["events"][0]["trigger_tok"] == 6
    assert d1["events"][0]["args"][0]["role"] == "AGENT"
    # two mentions of e1 -> one coref cluster
    assert len(d1["clusters"]) == 1
    assert {(m["start"], m["end"]) for m in d1["clusters"][0]} == {(0, 0), (5, 5)}

    d2 = out.loc["x2"]
    assert d2["dropped_entities"] == 1     # misaligned extent dropped
    assert d2["dropped_relations"] == 1    # referenced the dropped mention
    assert len(d2["clusters"]) == 0

    counters = drop_counters(read_standoff_xml(rd.from_items([{"doc_key": "k", "xml": xml}])))
    assert counters == {"entities": 1, "relations": 1, "events": 0, "corefs": 0}


def test_brat_multiline_annotations_align():
    """Annotations beyond the first line must align: the tokenizer
    splits on ALL whitespace, not just spaces (reader review r3)."""
    from dygiepp_ray.sources.brat import parse_brat_doc

    txt = "ab cd\nef gh\tij"
    ann = "T1\tGENE 6 8\tef\nT2\tCHEM 12 14\tij"
    doc = parse_brat_doc("d", txt, ann)
    assert doc["tokens"] == ["ab", "cd", "ef", "gh", "ij"]
    ner = {(m["start"], m["end"]): m["label"] for m in doc["ner"]}
    assert ner == {(2, 2): "GENE", (4, 4): "CHEM"}
    assert doc["dropped_entities"] == 0


def test_tar_members_roundtrip(ray_session):
    """Members written through stdlib tarfile come back with exact
    names, sizes and content hashes through the Ray stage."""
    import hashlib
    import io
    import tarfile as tf_mod

    import pandas as pd
    import pyarrow as pa

    import ray

    from dygiepp_ray.sources.tarball import tar_members

    buf = io.BytesIO()
    contents = {"a.txt": b"hello tar", "deep/b.txt": b"x" * 513}
    with tf_mod.open(fileobj=buf, mode="w") as tf:
        for name, data in contents.items():
            info = tf_mod.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    ds = rd.from_arrow(pa.table(
        {"archive_id": pa.array([3], pa.int64()),
         "payload": pa.array([buf.getvalue()], pa.binary())}
    ))
    out = tar_members(ds).to_pandas().set_index("name")
    assert len(out) == 2
    for name, data in contents.items():
        assert int(out.loc[name, "size"]) == len(data)
        assert out.loc[name, "content_md5"] == hashlib.md5(data).hexdigest()


def test_gzip_docs_roundtrip(ray_session):
    import gzip
    import hashlib

    import pandas as pd
    import pyarrow as pa

    import ray

    from dygiepp_ray.sources.tarball import gzip_docs

    raw = b"the quick brown fox" * 40
    ds = rd.from_arrow(pa.table(
        {"doc_id": pa.array([9], pa.int64()),
         "payload": pa.array([gzip.compress(raw)], pa.binary())}
    ))
    r = gzip_docs(ds).to_pandas().iloc[0]
    assert int(r["raw_size"]) == len(raw)
    assert r["content_md5"] == hashlib.md5(raw).hexdigest()
    assert int(r["compressed_size"]) < len(raw)  # it actually compressed


def test_csv_parse_rfc4180_edges(ray_session):
    """Hand-built CSV with every RFC 4180 edge: embedded comma, doubled
    quote, embedded newline inside a quoted field, CRLF records."""
    import hashlib

    import pyarrow as pa

    from dygiepp_ray.sources.csvfile import csv_docs

    payload = (
        'doc_id,category,text\r\n'
        '0,plain,hello world\r\n'
        '1,"with,comma","a,b"\r\n'
        '2,q,"say ""hi"" now"\r\n'
        '3,nl,"line1\nline2"\r\n'
    ).encode()
    ds = rd.from_arrow(pa.table(
        {"file_id": pa.array([0], pa.int64()),
         "payload": pa.array([payload], pa.binary())}))
    r = csv_docs(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(r["category"]) == ["plain", "with,comma", "q", "nl"]
    expect = ["hello world", "a,b", 'say "hi" now', "line1\nline2"]
    assert list(r["n_chars"]) == [len(t) for t in expect]
    assert list(r["text_md5"]) == [
        hashlib.md5(t.encode()).hexdigest() for t in expect]


def test_synth_csv_files_roundtrip(ray_session):
    """The rule generator round-trips through the real parser: 48 rows
    across 3 files, every variant recovered."""
    from dygiepp_ray.sources.csvfile import (
        _row_text, csv_docs, synth_csv_files, CSV_SEED)

    ds = rd.from_arrow(synth_csv_files(48, 3))
    r = csv_docs(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(r) == 48
    import hashlib
    for i in (0, 1, 2, 3, 47):
        cat, text = _row_text(i, CSV_SEED)
        assert r.loc[i, "category"] == cat
        assert r.loc[i, "n_chars"] == len(text)
        assert r.loc[i, "text_md5"] == hashlib.md5(text.encode()).hexdigest()


def test_brat_write_parse_roundtrip(ray_session):
    """S2 write side: format_brat_doc -> parse_brat_doc is the identity
    on (tokens, ner, relations, clusters), with ZERO drop counters —
    any char-offset mistake in the writer misaligns the reader."""
    import ray.data as rd

    from dygiepp_ray.sources import brat as B

    doc = {
        "doc_key": "d0",
        "tokens": ["alpha", "beta", "gamma", "delta", "eps"],
        "ner": [{"start": 0, "end": 1, "label": "A"},
                {"start": 2, "end": 2, "label": "B"},
                {"start": 3, "end": 4, "label": "A"}],
        "relations": [{"s1": 0, "e1": 1, "s2": 2, "e2": 2,
                       "label": "REL"}],
        "clusters": [[{"start": 0, "end": 1}, {"start": 3, "end": 4}]],
    }
    txt, ann = B.format_brat_doc(doc)
    back = B.parse_brat_doc("d0", txt, ann)
    assert back["tokens"] == doc["tokens"]
    assert back["ner"] == sorted(
        doc["ner"], key=lambda m: (m["start"], m["end"], m["label"]))
    assert [(r["s1"], r["e1"], r["s2"], r["e2"], r["label"])
            for r in back["relations"]] == [(0, 1, 2, 2, "REL")]
    assert back["clusters"] == [[{"start": 0, "end": 1},
                                 {"start": 3, "end": 4}]]
    assert all(back[f"dropped_{k}"] == 0
               for k in ("entities", "relations", "events", "corefs"))

    # distributed: write_brat rows re-parse identically via read_brat
    pairs = B.write_brat(rd.from_pandas(
        pd.DataFrame([{k: doc[k] for k in
                       ("doc_key", "tokens", "ner", "relations",
                        "clusters")}])))
    parsed = B.read_brat(pairs).to_pandas()
    assert len(parsed) == 1 and parsed.iloc[0]["doc_key"] == "d0"
    assert int(parsed.iloc[0]["dropped_entities"]) == 0
