"""Skosify config-FILE parity: the reference's ``--skosify cfg``
surface (/root/reference/mc2skos/mc2skos.py:244-245,198-201) mapped
onto the engine's post-pass operators (core/skosify_config.py +
jobs/convert.py).  The conversion test is the
/root/reference/test/test_skosify.py:19-23 analog driven through the
file-converter with the reference's own example config."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "jobs"))

from convert import convert  # noqa: E402

from mc2skos_spark.core.skosify_config import (OPTION_DEFAULTS,
                                               parse_skosify_config)
from mc2skos_spark.core.turtle import parse_turtle_file

EXAMPLES = "/root/reference/examples"
REFERENCE_CFG = os.path.join(EXAMPLES, "skosify.cfg")

BK = "http://uri.gbv.de/terminology/bk/"
SKOS = "http://www.w3.org/2004/02/skos/core#"


def test_parse_reference_example_cfg():
    """The reference ships examples/skosify.cfg:1-5 (narrower=True,
    transitive=True, empty extension sections) — parse it verbatim."""
    cfg = parse_skosify_config(REFERENCE_CFG)
    assert cfg["narrower"] is True
    assert cfg["transitive"] is True
    assert cfg["break_cycles"] is False          # default preserved
    assert cfg["preflabel_policy"] == "shortest"  # default preserved
    assert cfg["unsupported"] == []


def test_parse_unknown_keys_collected_not_fatal(tmp_path):
    p = tmp_path / "exotic.cfg"
    p.write_text("[options]\ntransitive=no\ncleanup_classes=True\n"
                 "[types]\nfoo=http://x/Type\n")
    cfg = parse_skosify_config(str(p))
    assert cfg["transitive"] is False            # INI boolean spelling
    assert cfg["narrower"] is OPTION_DEFAULTS["narrower"]
    assert set(cfg["unsupported"]) == {"options.cleanup_classes",
                                       "types.foo"}


@pytest.mark.spark
def test_convert_with_reference_skosify_cfg(spark, tmp_path):
    """`jobs/convert.py infile out.ttl --skosify examples/skosify.cfg`:
    narrower=True adds the inverse the reference's skosify test asserts
    (bk:54 skos:narrower bk:54.65) and transitive=True materializes
    skos:broaderTransitive — without the separate --expand/--transitive
    flags."""
    out = str(tmp_path / "out.ttl")
    stats = convert(spark, [os.path.join(EXAMPLES, "bk-54.65.xml")],
                    out, altlabels=True, skosify=REFERENCE_CFG)
    produced = set(parse_turtle_file(out))
    assert (BK + "54", SKOS + "narrower", BK + "54.65",
            False, None, None, None) in produced
    assert (BK + "54.65", SKOS + "broaderTransitive", BK + "54",
            False, None, None, None) in produced
    assert stats["skosify_config"]["transitive"] is True
    assert stats["validation_warnings"] == 0


@pytest.mark.spark
def test_convert_skosify_cfg_toggles_off(spark, tmp_path):
    """narrower=False / transitive=False: the cfg-driven pass still
    runs the check+repair half but adds NO inferred edges — output
    equals the plain conversion."""
    cfg = tmp_path / "off.cfg"
    cfg.write_text("[options]\nnarrower=False\ntransitive=False\n")
    out = str(tmp_path / "out.ttl")
    convert(spark, [os.path.join(EXAMPLES, "bk-54.65.xml")],
            out, altlabels=True, skosify=str(cfg))
    produced = set(parse_turtle_file(out))
    plain_out = str(tmp_path / "plain.ttl")
    convert(spark, [os.path.join(EXAMPLES, "bk-54.65.xml")],
            plain_out, altlabels=True)
    assert produced == set(parse_turtle_file(plain_out))


@pytest.mark.spark
def test_cli_bare_skosify_before_positionals(tmp_path):
    """Regression: nargs='?' must not eat the first positional —
    `convert.py --skosify in.xml out.ttl` is the pre-cfg invocation and
    must keep working (the consumed token is given back when it is
    plainly an RDF/XML file, and --skosify degrades to the boolean)."""
    import json
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "out.ttl")
    run = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "convert.py"),
         "--skosify",
         os.path.join(EXAMPLES, "gnd-1020118989.xml"), out,
         "--scheme", "gnd"],
        capture_output=True, text=True, timeout=300)
    assert run.returncode == 0, run.stderr[-1500:]
    stats = json.loads(run.stdout.strip().splitlines()[-1])
    assert stats["subjects"] >= 1
    assert stats["validation_warnings"] == 0      # boolean mode ran
    assert "skosify_config" not in stats          # no cfg was parsed


def test_parse_non_ini_file_is_a_clear_error(tmp_path):
    p = tmp_path / "records.xml"
    p.write_text("<record>not an ini</record>")
    with pytest.raises(ValueError, match="skosify INI config"):
        parse_skosify_config(str(p))
