"""Corpus-faithful ACE-APF and GENIA-inline readers (SURVEY.md S9/S10)
against hand-built fixtures with hand-computed token expectations —
the reference's reader-unit-test style (dygie/tests/data/dygie_test.py)."""

import pandas as pd

import ray.data

from dygiepp_ray.sources.apf import parse_apf_doc, read_apf, strip_sgm
from dygiepp_ray.sources.genia import parse_genia_article, read_genia

SGM = (
    "<DOC>\n<DOCID> t1 </DOCID>\n<TEXT>\n"
    "John Smith visited Acme Corp on Friday .\nHe bought shares .\n"
    "</TEXT>\n</DOC>\n"
)
TEXT = strip_sgm(SGM)
# tokens: 0 t1  1 John  2 Smith  3 visited  4 Acme  5 Corp  6 on
#         7 Friday  8 .  9 He  10 bought  11 shares  12 .


def _cs(surface, occurrence=0):
    """(START, END-inclusive) char extent of a surface string."""
    pos = -1
    for _ in range(occurrence + 1):
        pos = TEXT.index(surface, pos + 1)
    return pos, pos + len(surface) - 1


def _charseq(surface, occurrence=0):
    s, e = _cs(surface, occurrence)
    return f'<charseq START="{s}" END="{e}">{surface}</charseq>'


APF = f"""
<source_file>
 <document DOCID="t1">
  <entity ID="E1" TYPE="PER">
   <entity_mention ID="E1-1" TYPE="NAM">
    <extent>{_charseq("John Smith")}</extent>
    <head>{_charseq("Smith")}</head>
   </entity_mention>
   <entity_mention ID="E1-2" TYPE="PRO">
    <extent>{_charseq("He")}</extent>
    <head>{_charseq("He")}</head>
   </entity_mention>
  </entity>
  <entity ID="E2" TYPE="ORG">
   <entity_mention ID="E2-1" TYPE="NAM">
    <extent>{_charseq("Acme Corp")}</extent>
    <head><charseq START="{_cs("Acme Corp")[0] + 1}" END="{_cs("Acme Corp")[1]}">cme Corp</charseq></head>
   </entity_mention>
  </entity>
  <timex2 ID="T1">
   <timex2_mention ID="T1-1">
    <extent>{_charseq("Friday")}</extent>
   </timex2_mention>
  </timex2>
  <relation ID="R1" TYPE="ORG-AFF" SUBTYPE="Employment">
   <relation_mention ID="R1-1">
    <relation_mention_argument REFID="E1-1" ROLE="Arg-1"/>
    <relation_mention_argument REFID="E2-1" ROLE="Arg-2"/>
   </relation_mention>
  </relation>
  <relation ID="R2" TYPE="PART-WHOLE" SUBTYPE="Geographical">
   <relation_mention ID="R2-1">
    <relation_mention_argument REFID="E1-1" ROLE="Arg-1"/>
    <relation_mention_argument REFID="MISSING" ROLE="Arg-2"/>
   </relation_mention>
  </relation>
  <event ID="V1" TYPE="Movement" SUBTYPE="Transport">
   <event_mention ID="V1-1">
    <anchor>{_charseq("visited")}</anchor>
    <event_mention_argument REFID="E1-1" ROLE="Artifact"/>
    <event_mention_argument REFID="E2-1" ROLE="Destination"/>
   </event_mention>
   <event_mention ID="V1-2">
    <anchor>{_charseq("bought")}</anchor>
   </event_mention>
  </event>
  <event ID="V2" TYPE="Transaction" SUBTYPE="Transfer-Ownership">
   <event_mention ID="V2-1">
    <anchor>{_charseq("bought shares")}</anchor>
   </event_mention>
  </event>
 </document>
</source_file>
"""


def test_apf_entities_values_and_snap():
    doc = parse_apf_doc("fallback", APF, SGM)
    assert doc["doc_key"] == "t1"
    assert doc["tokens"][1:3] == ["John", "Smith"]
    ner = {(m["start"], m["end"]): m["label"] for m in doc["ner"]}
    # heads-only: PER mention = "Smith" (tok 2), pronoun "He" (tok 9)
    assert ner[(2, 2)] == "PER"
    assert ner[(9, 9)] == "PER"
    # "cme Corp" head snaps outward to the containing tokens 4..5
    assert ner[(4, 5)] == "ORG"
    assert doc["snapped"] == 1
    assert ner[(7, 7)] == "TIMEX2"


def test_apf_relations_events_clusters():
    doc = parse_apf_doc("t1", APF, SGM)
    assert doc["relations"] == [
        {"s1": 2, "e1": 2, "s2": 4, "e2": 5, "label": "ORG-AFF.Employment"}
    ]
    assert doc["dropped_relations"] == 1  # MISSING REFID
    assert doc["events"] == [
        {
            "trigger_tok": 3,
            "event_type": "Movement.Transport",
            "args": [
                {"start": 2, "end": 2, "role": "Artifact"},
                {"start": 4, "end": 5, "role": "Destination"},
            ],
        },
        {"trigger_tok": 10, "event_type": "Movement.Transport", "args": []},
    ]
    assert doc["dropped_events"] == 1  # multi-token anchor skipped
    # E1's two mentions form the only coref cluster
    assert doc["clusters"] == [[{"start": 2, "end": 2}, {"start": 9, "end": 9}]]
    # V1's two surviving mentions form an event cluster of triggers
    assert doc["event_clusters"] == [
        [{"start": 3, "end": 3}, {"start": 10, "end": 10}]
    ]


def test_apf_reader_dataset(ray_session):
    ds = ray.data.from_items([{"doc_key": "t1", "apf": APF, "sgm": SGM}])
    df = read_apf(ds).to_pandas()
    assert len(df) == 1
    assert df.loc[0, "dropped_events"] == 1


GENIA = """
<article>
 <articleinfo><bibliomisc>MEDLINE:97050754</bibliomisc></articleinfo>
 <title>
  <sentence>Regulation of <cons sem="G#protein_molecule" lex="IL-2">IL-2</cons> expression</sentence>
 </title>
 <abstract>
  <sentence>We studied <cons sem="G#cell_type" lex="T_cell">T cells</cons> closely .</sentence>
  <sentence>The <cons lex="(AND IL-2_gene IL-4_gene)" sem="(AND G#other_name G#DNA_domain_or_region)"><cons lex="IL-2*">IL-2</cons> and <cons lex="IL-4_gene">IL-4 genes</cons></cons> respond , and <cons sem="G#protein_complex" lex="NF-kB"><cons sem="G#protein_molecule" lex="p50">p50</cons> dimers</cons> bind .</sentence>
 </abstract>
</article>
"""


def test_genia_nested_and_coordination():
    doc = parse_genia_article(GENIA)
    assert doc["doc_key"] == "MEDLINE:97050754"
    # sentence 1: Regulation(0) of(1) IL-2(2) expression(3)
    # sentence 2 (offset 4): We(4) studied(5) T(6) cells(7) closely(8) .(9)
    # sentence 3 (offset 10): The(10) IL-2(11) and(12) IL-4(13) genes(14)
    #   respond(15) ,(16) and(17) p50(18) dimers(19) bind(20) .(21)
    assert doc["sentence_start"] == [0, 4, 10]
    got = {(m["start"], m["end"], m["label"]) for m in doc["ner"]}
    assert (2, 2, "G#protein_molecule") in got
    assert (6, 7, "G#cell_type") in got
    # coordination distributes labels over the two lex-only sub-cons
    assert (11, 11, "G#other_name") in got
    assert (13, 14, "G#DNA_domain_or_region") in got
    # nested cons both emit
    assert (18, 18, "G#protein_molecule") in got
    assert (18, 19, "G#protein_complex") in got
    assert doc["dropped_entities"] == 0


def test_genia_unresolvable_coordination_dropped():
    xml = """<article><sentence>the <cons sem="(AND G#a G#b G#c)">
<cons lex="x">alpha</cons> and <cons lex="y">beta</cons></cons> end</sentence></article>"""
    doc = parse_genia_article(xml, default_doc_key="d")
    assert doc["ner"] == []
    assert doc["dropped_entities"] == 1


def test_genia_reader_dataset(ray_session):
    ds = ray.data.from_items(
        [{"doc_key": f"g{i}", "xml": GENIA} for i in range(3)]
    )
    df = read_genia(ds).to_pandas()
    assert len(df) == 3
    assert all(df["doc_key"] == "MEDLINE:97050754")


def test_genia_coordination_uses_direct_children_only():
    # One DIRECT constituent (holding a nested cons) but two labels:
    # must be dropped, never distributed over all descendants.
    xml = """<article><sentence>x <cons sem="(AND G#a G#b)"><cons lex="outer"><cons lex="inner">alpha</cons> beta</cons> and gamma</cons> .</sentence></article>"""
    doc = parse_genia_article(xml, default_doc_key="d")
    assert doc["ner"] == []
    assert doc["dropped_entities"] == 1
