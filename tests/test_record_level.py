"""Record-level semantic tests, ported from
/root/reference/test/test_process_record.py:17-536."""

import pytest

from mc2skos_spark.core import constants as C
from mc2skos_spark.core.errors import InvalidRecordError
from mc2skos_spark.core.extract import extract_concept
from mc2skos_spark.core.marcxml import parse_record_xml
from mc2skos_spark.core.triples import concept_to_triples
from mc2skos_spark.core.vocab import Vocabularies

SKOS = C.SKOS
MX = 'xmlns:mx="http://www.loc.gov/MARC21/slim"'


def extract(xml, vocabularies=None, **options):
    vocabularies = vocabularies or Vocabularies()
    return extract_concept(parse_record_xml(xml), vocabularies, options)


def test_simple_number():
    bag = extract('''
        <mx:record %s>
          <mx:leader>00000nw  a2200000n  4500</mx:leader>
          <mx:controlfield tag="008">091203aaaaaaaa</mx:controlfield>
          <mx:datafield tag="084" ind2=" " ind1="0">
            <mx:subfield code="a">ddc</mx:subfield>
            <mx:subfield code="c">23no</mx:subfield>
            <mx:subfield code="e">nob</mx:subfield>
          </mx:datafield>
          <mx:datafield tag="153" ind2=" " ind1=" ">
            <mx:subfield code="a">152</mx:subfield>
            <mx:subfield code="e">152</mx:subfield>
            <mx:subfield code="f">158</mx:subfield>
            <mx:subfield code="j">Sansing, bevegelse, emosjoner, fysiologiske drifter</mx:subfield>
            <mx:subfield code="9">ess=en</mx:subfield>
            <mx:subfield code="9">ess=eh</mx:subfield>
          </mx:datafield>
        </mx:record>''' % MX)
    assert bag["record_type"] == C.SCHEDULE_RECORD
    assert bag["number_type"] == C.SINGLE_NUMBER
    assert bag["display"] is True
    assert bag["synthesized"] is False


def test_add_table_number():
    bag = extract('''
        <mx:record %s>
            <mx:leader>00000nw  a2200000n  4500</mx:leader>
            <mx:controlfield tag="008">100414baabaaaa</mx:controlfield>
            <mx:datafield tag="084" ind2=" " ind1="0">
                <mx:subfield code="a">ddc</mx:subfield>
                <mx:subfield code="c">23no</mx:subfield>
            </mx:datafield>
            <mx:datafield tag="153" ind2=" " ind1=" ">
                <mx:subfield code="a">811</mx:subfield>
                <mx:subfield code="c">818</mx:subfield>
                <mx:subfield code="y">2</mx:subfield>
                <mx:subfield code="a">4</mx:subfield>
                <mx:subfield code="e">811</mx:subfield>
                <mx:subfield code="f">818</mx:subfield>
                <mx:subfield code="j">1867-1899 i Canada</mx:subfield>
            </mx:datafield>
        </mx:record>''' % MX)
    assert bag["record_type"] == C.TABLE_RECORD
    assert bag["notation"] == "811-818:2;4"
    assert len(bag["relations"]) == 1
    assert bag["relations"][0]["uri"] == "http://dewey.info/class/811-818/e23/"
    assert bag["relations"][0]["relation"] == SKOS + "broader"
    # add-table number (':' in notation) is not public (record.py:586-589)
    assert bag["is_public"] is False


def test_historical_add_table_number():
    """test_process_record.py:80-106: 008 'baaaaaah' → historical add
    table record: TABLE_RECORD, display False, not synthesized."""
    bag = extract('''
        <mx:record %s>
            <mx:leader>00000nw  a2200000n  4500</mx:leader>
            <mx:controlfield tag="008">091203baaaaaah</mx:controlfield>
            <mx:datafield tag="084" ind2=" " ind1="0">
                <mx:subfield code="a">ddc</mx:subfield>
                <mx:subfield code="c">23no</mx:subfield>
                <mx:subfield code="e">nob</mx:subfield>
            </mx:datafield>
            <mx:datafield tag="153" ind2=" " ind1=" ">
                <mx:subfield code="a">820.1</mx:subfield>
                <mx:subfield code="c">828</mx:subfield>
                <mx:subfield code="y">1</mx:subfield>
                <mx:subfield code="a">7</mx:subfield>
                <mx:subfield code="e">820</mx:subfield>
                <mx:subfield code="j">1800-1837</mx:subfield>
                <mx:subfield code="9">ess=reb</mx:subfield>
                <mx:subfield code="9">ess=rhb</mx:subfield>
            </mx:datafield>
        </mx:record>''' % MX)
    assert bag["record_type"] == C.TABLE_RECORD
    assert bag["number_type"] == C.SINGLE_NUMBER
    assert bag["display"] is False
    assert bag["synthesized"] is False


def test_synthesized_number_span():
    """test_process_record.py:108-132."""
    bag = extract('''
        <mx:record %s>
          <mx:leader>00000nw  a2200000n  4500</mx:leader>
          <mx:controlfield tag="008">091203abdaaaba</mx:controlfield>
          <mx:datafield tag="084" ind2=" " ind1="0">
            <mx:subfield code="a">ddc</mx:subfield>
            <mx:subfield code="c">23no</mx:subfield>
            <mx:subfield code="e">nob</mx:subfield>
          </mx:datafield>
          <mx:datafield tag="153" ind2=" " ind1=" ">
            <mx:subfield code="a">133.01</mx:subfield>
            <mx:subfield code="c">133.09</mx:subfield>
            <mx:subfield code="e">133</mx:subfield>
            <mx:subfield code="j">Generell forminndeling</mx:subfield>
            <mx:subfield code="9">ess=en</mx:subfield>
            <mx:subfield code="9">ess=eh</mx:subfield>
          </mx:datafield>
        </mx:record>''' % MX)
    assert bag["record_type"] == C.SCHEDULE_RECORD
    assert bag["number_type"] == C.NUMBER_SPAN
    assert bag["display"] is True
    assert bag["synthesized"] is True


def test_synthesized_schedule_record():
    """test_process_record.py:134-155."""
    bag = extract('''
        <mx:record %s>
          <mx:leader>00000nw  a2200000n  4500</mx:leader>
          <mx:controlfield tag="008">091203aaaaaabb</mx:controlfield>
          <mx:datafield tag="084" ind2=" " ind1="0">
            <mx:subfield code="a">ddc</mx:subfield>
            <mx:subfield code="c">23no</mx:subfield>
            <mx:subfield code="e">nob</mx:subfield>
          </mx:datafield>
          <mx:datafield tag="153" ind2=" " ind1=" ">
            <mx:subfield code="a">025.1712</mx:subfield>
            <mx:subfield code="e">025.17</mx:subfield>
            <mx:subfield code="9">ess=ien</mx:subfield>
          </mx:datafield>
        </mx:record>''' % MX)
    assert bag["record_type"] == C.SCHEDULE_RECORD
    assert bag["number_type"] == C.SINGLE_NUMBER
    assert bag["display"] is True
    assert bag["synthesized"] is True


def test_index_terms_with_caption_ordering():
    bag = extract('''
        <mx:record %s>
            <mx:leader>00000nw  a2200000n  4500</mx:leader>
            <mx:controlfield tag="008">091203aaaaaabb</mx:controlfield>
            <mx:datafield tag="084" ind2=" " ind1="0">
              <mx:subfield code="a">ddc</mx:subfield>
              <mx:subfield code="c">23no</mx:subfield>
              <mx:subfield code="e">nob</mx:subfield>
            </mx:datafield>
            <mx:datafield tag="153" ind2=" " ind1=" ">
              <mx:subfield code="a">006.686</mx:subfield>
              <mx:subfield code="e">006.68</mx:subfield>
              <mx:subfield code="9">ess=ien</mx:subfield>
            </mx:datafield>
            <mx:datafield tag="730" ind2="7" ind1=" ">
              <mx:subfield code="a">CorelDRAW</mx:subfield>
              <mx:subfield code="0">(OCoLC-D)99928acf-5fcb-4b49-b12c-9d4bdcb369b1</mx:subfield>
              <mx:subfield code="2">ddcri</mx:subfield>
              <mx:subfield code="9">ps=EO</mx:subfield>
            </mx:datafield>
            <mx:datafield tag="750" ind2="7" ind1=" ">
              <mx:subfield code="a">CorelDRAW!</mx:subfield>
              <mx:subfield code="0">(OCoLC-D)73e62e00-d820-48bb-b5a6-d5f4ceab2d12</mx:subfield>
              <mx:subfield code="2">ddcri</mx:subfield>
              <mx:subfield code="9">ps=EO</mx:subfield>
            </mx:datafield>
            <mx:datafield tag="750" ind2="7" ind1=" ">
              <mx:subfield code="a">Personlige datamaskiner</mx:subfield>
              <mx:subfield code="x">grafikkprogrammer</mx:subfield>
              <mx:subfield code="0">(OCoLC-D)1226b03f-c205-420e-ae21-34d41be81715</mx:subfield>
              <mx:subfield code="2">ddcri</mx:subfield>
              <mx:subfield code="9">ps=PE</mx:subfield>
              <mx:subfield code="9">ess=isCaption</mx:subfield>
            </mx:datafield>
        </mx:record>''' % MX)
    assert bag["prefLabel"] is None
    assert bag["altLabel"] == [
        "Personlige datamaskiner--grafikkprogrammer",
        "CorelDRAW",
        "CorelDRAW!",
    ]


def test_index_terms_subdivision_join():
    bag = extract('''
        <mx:record %s>
          <mx:leader>00000nw  a2200000n  4500</mx:leader>
          <mx:controlfield tag="001">ocd00146759</mx:controlfield>
          <mx:controlfield tag="008">100204aaaaaaaa</mx:controlfield>
          <mx:datafield tag="084" ind2=" " ind1="0">
            <mx:subfield code="a">ddc</mx:subfield>
            <mx:subfield code="c">23no</mx:subfield>
          </mx:datafield>
          <mx:datafield tag="153" ind2=" " ind1=" ">
            <mx:subfield code="a">543.17</mx:subfield>
            <mx:subfield code="e">543.1</mx:subfield>
            <mx:subfield code="j">Analytisk organisk kjemi</mx:subfield>
          </mx:datafield>
          <mx:datafield tag="750" ind2="7" ind1=" ">
            <mx:subfield code="a">Analytisk kjemi</mx:subfield>
            <mx:subfield code="x">organisk kjemi</mx:subfield>
            <mx:subfield code="0">(OCoLC-D)8c2057ce</mx:subfield>
            <mx:subfield code="2">ddcri</mx:subfield>
          </mx:datafield>
          <mx:datafield tag="750" ind2="7" ind1=" ">
            <mx:subfield code="a">Kjemisk analyse</mx:subfield>
            <mx:subfield code="x">organisk kjemi</mx:subfield>
            <mx:subfield code="0">(OCoLC-D)934d9916</mx:subfield>
            <mx:subfield code="2">ddcri</mx:subfield>
          </mx:datafield>
          <mx:datafield tag="750" ind2="7" ind1=" ">
            <mx:subfield code="a">Organisk kjemi</mx:subfield>
            <mx:subfield code="x">analytisk kjemi</mx:subfield>
            <mx:subfield code="0">(OCoLC-D)9d92b5a2</mx:subfield>
            <mx:subfield code="2">ddcri</mx:subfield>
          </mx:datafield>
        </mx:record>''' % MX)
    assert bag["altLabel"] == ["Analytisk kjemi--organisk kjemi",
                               "Kjemisk analyse--organisk kjemi",
                               "Organisk kjemi--analytisk kjemi"]


def test_components():
    bag = extract('''
        <mx:record %s>
          <mx:leader>00000nw  a2200000n  4500</mx:leader>
          <mx:controlfield tag="001">ocd00132963</mx:controlfield>
          <mx:controlfield tag="008">100204aaaaaabb</mx:controlfield>
          <mx:datafield tag="084" ind2=" " ind1="0">
            <mx:subfield code="a">ddc</mx:subfield>
            <mx:subfield code="c">23no</mx:subfield>
          </mx:datafield>
          <mx:datafield tag="153" ind2=" " ind1=" ">
            <mx:subfield code="a">306.6804</mx:subfield>
            <mx:subfield code="e">306.63</mx:subfield>
            <mx:subfield code="f">306.69</mx:subfield>
            <mx:subfield code="9">ess=ien</mx:subfield>
          </mx:datafield>
          <mx:datafield tag="765" ind2=" " ind1="0">
            <mx:subfield code="b">306.6</mx:subfield>
            <mx:subfield code="a">306.63</mx:subfield>
            <mx:subfield code="c">306.69</mx:subfield>
            <mx:subfield code="r">2</mx:subfield>
            <mx:subfield code="s">804</mx:subfield>
            <mx:subfield code="u">306.6804</mx:subfield>
            <mx:subfield code="9">ess=hn</mx:subfield>
          </mx:datafield>
        </mx:record>''' % MX, include_components=True)
    assert bag["components"] == ["306.6", "280.4"]
    # U3 positional cons-list normalization (test_process_record.py:527-536)
    rows = concept_to_triples(bag, {"include_components": True})
    comp_rows = sorted(r for r in rows if r[1] == C.MADS + "componentList")
    assert [(r[2], r[6]) for r in comp_rows] == [
        ("http://dewey.info/class/280.4/e23/", 1),
        ("http://dewey.info/class/306.6/e23/", 0),
    ]


def test_empty_record_raises():
    with pytest.raises(InvalidRecordError):
        extract('<marc:record xmlns:marc="http://www.loc.gov/MARC21/slim"></marc:record>')


def test_invalid_leader_raises():
    with pytest.raises(InvalidRecordError):
        extract('''
          <marc:record xmlns:marc="http://www.loc.gov/MARC21/slim">
            <marc:leader>00000aa  a2200000n  4500</marc:leader>
            <marc:datafield tag="084" ind2=" " ind1="0">
              <marc:subfield code="a">ddc</marc:subfield>
            </marc:datafield>
          </marc:record>''')


def test_record_without_153_raises():
    with pytest.raises(InvalidRecordError):
        extract('''
          <marc:record xmlns:marc="http://www.loc.gov/MARC21/slim">
            <marc:leader>00000nw  a2200000n  4500</marc:leader>
            <marc:datafield tag="084" ind2=" " ind1="0">
              <marc:subfield code="a">ddc</marc:subfield>
              <marc:subfield code="c">23no</marc:subfield>
            </marc:datafield>
          </marc:record>''')


def test_exact_triple_set_with_default_scheme():
    """Full-record exact triple-set equality (test_process_record.py:441-465)."""
    vocabularies = Vocabularies()
    vocabularies.set_default_scheme("http://test/{object}")
    bag = extract('''
          <marc:record xmlns:marc="http://www.loc.gov/MARC21/slim">
            <marc:leader>00000nw  a2200000n  4500</marc:leader>
            <marc:datafield tag="153" ind1=" " ind2=" ">
              <marc:subfield code="a">003.5</marc:subfield>
              <marc:subfield code="e">003</marc:subfield>
              <marc:subfield code="h">Generalities</marc:subfield>
              <marc:subfield code="h">Systems</marc:subfield>
              <marc:subfield code="j">Theory of communication and control</marc:subfield>
            </marc:datafield>
          </marc:record>''', vocabularies=vocabularies)
    uri = "http://test/003.5"
    assert set(concept_to_triples(bag, {})) == {
        (uri, C.RDF + "type", SKOS + "Concept", False, None, None, None),
        (uri, SKOS + "broader", "http://test/003", False, None, None, None),
        (uri, SKOS + "prefLabel", "Theory of communication and control",
         True, "en", None, None),
        (uri, SKOS + "inScheme", "http://test/", False, None, None, None),
        (uri, SKOS + "notation", "003.5", True, None, None, None),
    }


def test_malformed_mapping_edge_warns_and_keeps_record():
    """An 024 with $2 but no $a (control_number=None) must not destroy
    the record: the single edge is warn-skipped like the unknown-scheme
    branch, every other triple survives."""
    bag = extract('''
        <mx:record %s>
          <mx:leader>00000nz  a2200000n  4500</mx:leader>
          <mx:controlfield tag="001">sh0001</mx:controlfield>
          <mx:controlfield tag="008">120224n|aana               a aaa     </mx:controlfield>
          <mx:datafield tag="040" ind1=" " ind2=" ">
            <mx:subfield code="b">eng</mx:subfield></mx:datafield>
          <mx:datafield tag="150" ind1=" " ind2=" ">
            <mx:subfield code="a">Topic</mx:subfield></mx:datafield>
          <mx:datafield tag="024" ind1="7" ind2=" ">
            <mx:subfield code="2">viaf</mx:subfield></mx:datafield>
        </mx:record>''' % MX)
    assert bag["prefLabel"] == "Topic"
    assert bag["relations"] == []
    assert any("cannot mint" in w for w in bag["warnings"])


def test_153_without_notation_raises_invalid_record():
    """$j-only 153 (notation None) must surface as InvalidRecordError —
    the documented contract — not a raw TypeError from template
    expansion slicing None."""
    with pytest.raises(InvalidRecordError) as err:
        extract('''
            <mx:record %s>
              <mx:leader>00000nw  a2200000n  4500</mx:leader>
              <mx:controlfield tag="008">091203aaaaaaaa</mx:controlfield>
              <mx:datafield tag="084" ind1="0" ind2=" ">
                <mx:subfield code="a">ddc</mx:subfield>
                <mx:subfield code="c">23</mx:subfield></mx:datafield>
              <mx:datafield tag="153" ind1=" " ind2=" ">
                <mx:subfield code="j">Caption only</mx:subfield>
              </mx:datafield>
            </mx:record>''' % MX)
    assert "URI minting" in str(err.value)


def test_unknown_008_values_surface_warnings():
    """Unknown 008/6 makes the record UNKNOWN+unpublishable; without a
    warning row it would vanish without a trace (the reference logs it,
    record.py:461,498)."""
    bag = extract('''
        <mx:record %s>
          <mx:leader>00000nw  a2200000n  4500</mx:leader>
          <mx:controlfield tag="008">091203xaaaaaax</mx:controlfield>
          <mx:datafield tag="084" ind1="0" ind2=" ">
            <mx:subfield code="a">ddc</mx:subfield>
            <mx:subfield code="c">23</mx:subfield></mx:datafield>
          <mx:datafield tag="153" ind1=" " ind2=" ">
            <mx:subfield code="a">111</mx:subfield>
            <mx:subfield code="j">Caption</mx:subfield></mx:datafield>
        </mx:record>''' % MX)
    assert bag["is_public"] is False
    assert "unknown value in 008/6: x" in bag["warnings"]
    assert "unknown value in 008/13: x" in bag["warnings"]


def test_comment_in_subfield_flattens_like_reference():
    """lxml keeps comments as child nodes, so the reference's flatten
    drops leading text and keeps tails (element.py:52-60) — ours must
    match byte-for-byte."""
    from mc2skos_spark.core.marcxml import parse_record_xml
    rec = parse_record_xml(
        '<record xmlns="http://www.loc.gov/MARC21/slim">'
        '<leader>00000nw  a2200000n  4500</leader>'
        '<datafield tag="680" ind1=" " ind2=" ">'
        '<subfield code="i">abc<!--note-->def</subfield>'
        '</datafield></record>')
    assert rec["datafields"][0]["subfields"][0]["value"] == "def"


def test_multi_record_collection_is_rejected():
    from mc2skos_spark.core.marcxml import parse_record_xml
    rec = ('<record xmlns="http://www.loc.gov/MARC21/slim">'
           '<leader>00000nw  a2200000n  4500</leader></record>')
    with pytest.raises(ValueError, match="expected one"):
        parse_record_xml('<collection xmlns="http://www.loc.gov/MARC21/'
                         'slim">%s%s</collection>'
                         % (rec.replace(' xmlns="http://www.loc.gov/'
                                        'MARC21/slim"', ''),
                            rec.replace(' xmlns="http://www.loc.gov/'
                                        'MARC21/slim"', '')))


def test_language_derivation():
    vocabularies = Vocabularies()
    vocabularies.set_default_scheme("http://test/{object}")
    bag = extract('''
          <marc:record xmlns:marc="http://www.loc.gov/MARC21/slim">
            <marc:leader>00000nw  a2200000n  4500</marc:leader>
            <marc:datafield tag="040" ind2=" " ind1=" ">
              <marc:subfield code="a">OCLCD</marc:subfield>
              <marc:subfield code="b">nob</marc:subfield>
              <marc:subfield code="c">OCLCD</marc:subfield>
            </marc:datafield>
            <marc:datafield tag="153" ind2=" " ind1=" ">
              <marc:subfield code="a">564.58</marc:subfield>
              <marc:subfield code="e">564.5</marc:subfield>
              <marc:subfield code="j">Decapoda (tiarmede blekkspruter)</marc:subfield>
            </marc:datafield>
          </marc:record>''', vocabularies=vocabularies)
    assert bag["lang"] == "nb"
    rows = concept_to_triples(bag, {})
    pref = [r for r in rows if r[1] == SKOS + "prefLabel"]
    assert pref[0][4] == "nb"
