"""IDN host folding (r10): our RFC 3492 punycode implementation
pinned against CPython's independent `punycode` codec (the codec
discipline: own implementation, third-party adjudication), the
ace_host folding contract, and the three-way pin of the q222 oracle's
literal map (literal == stdlib == ours)."""

from __future__ import annotations

import random

from dataingestiontohana_spark.functions.idn import ace_host, punycode_encode
from dataingestiontohana_spark.plans.ingestion import _IDN_HOSTS


def _stdlib_ace(host: str) -> str:
    out = []
    for lab in host.lower().split("."):
        if all(ord(c) < 128 for c in lab):
            out.append(lab)
        else:
            out.append("xn--" + lab.encode("punycode").decode("ascii"))
    return ".".join(out)


def test_punycode_matches_stdlib_on_random_labels():
    """3000 random labels across Latin-1/general/CJK planes: our
    bootstring encoder must agree with CPython's codec on every one
    (bias adaptation and the variable-length digit loop are where
    independent implementations desync)."""
    rng = random.Random(3492)
    tested = 0
    for _ in range(3000):
        n = rng.randint(1, 12)
        chars = []
        for _c in range(n):
            kind = rng.randint(0, 2)
            if kind == 0:
                cp = rng.randint(97, 122)
            elif kind == 1:
                cp = rng.randint(0x80, 0x2FFF)
            else:
                cp = rng.randint(0x3040, 0x9FFF)
            chars.append(chr(cp))
        label = "".join(chars)
        if all(ord(c) < 128 for c in label):
            continue
        tested += 1
        assert punycode_encode(label) == (
            label.encode("punycode").decode("ascii")
        ), repr(label)
    assert tested > 2500


def test_rfc_appendix_sample():
    """RFC 3492 §7.1 sample (H): 'Japanese 3nen B gumi kinpachi
    sensei' — the published mixed-basic/extended vector, lowercased
    (our fold lowercases before encoding)."""
    label = "3年b組金八先生"
    assert punycode_encode(label) == "3b-ww4c5e180e575a65lsy2b"


def test_ace_host_contract_and_idempotence():
    assert ace_host("BÜCHER.Example") == "xn--bcher-kva.example"
    assert ace_host("plain-ASCII.Example") == "plain-ascii.example"
    # already-encoded ACE labels fold by case only (idempotence)
    assert ace_host("XN--BCHER-KVA.example") == "xn--bcher-kva.example"
    for host, _ in _IDN_HOSTS:
        assert ace_host(ace_host(host)) == ace_host(host)


def test_oracle_literal_map_three_way_pin():
    """The q222 oracle adjudicates against LITERAL expected ACE
    strings; this pins every literal against BOTH the stdlib codec
    and our implementation, so the oracle's map is an adjudicated
    fixture, never a tautology."""
    for host, expected_ace in _IDN_HOSTS:
        assert _stdlib_ace(host) == expected_ace, host
        assert ace_host(host) == expected_ace, host
        # the uppercase spelling planted in the corpus folds too
        assert ace_host(host.upper()) == expected_ace, host


def test_q222_plan_gates_python_behind_ascii_fast_path(spark):
    """The scale shape: the pandas UDF must appear ONCE, on the
    non-ASCII residue only — ArrowEvalPython in the plan, never
    row-at-a-time BatchEvalPython; ASCII rows fold in codegen."""
    from dataingestiontohana_spark.plans.ingestion import q222_idn_host

    df = q222_idn_host(spark, "unused")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("ArrowEvalPython") == 1
    rows = df.collect()
    assert len(rows) == 9
    assert all(r["n_urls"] == 3 for r in rows)
    assert all(ord(c) < 128 for r in rows for c in r["ace_host"])
