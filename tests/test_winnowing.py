"""Winnowing fingerprint properties (Schleimer et al. SIGMOD'03): the
match guarantee (any shared token run past the threshold shares a
selected fingerprint), the density bound, and relocation invariance —
on constructed documents where the truths are known."""

from __future__ import annotations

import pytest

from dataingestiontohana_spark.plans.llm_dedup import (
    _WINNOW_W,
    _winnow_selected,
)


@pytest.fixture(scope="module")
def fp_frame(spark, tmp_path_factory):
    """A tiny parquet 'documents' table with planted structure:
    docs 1 and 2 share a long verbatim run at DIFFERENT offsets; doc 3
    is unrelated; doc 4 is too short to fingerprint."""
    base = tmp_path_factory.mktemp("winnow")
    shared = " ".join(f"s{i}" for i in range(12))  # 12-token run
    rows = [
        (1, "alpha beta gamma " + shared + " delta", "en", "srcA", 0),
        (2, shared + " zeta eta theta iota kappa", "en", "srcA", 0),
        (3, " ".join(f"u{i}" for i in range(30)), "en", "srcB", 0),
        (4, "just three tokens", "en", "srcB", 0),  # 1 shingle < W
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(base / "documents.parquet"))
    return _winnow_selected(spark, str(base)), base


def test_guarantee_shared_run_shares_a_fingerprint(spark, fp_frame):
    sel, _ = fp_frame
    rows = sel.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["c"] >> 31)
    # the 12-token shared run is far past the w+2 guarantee threshold:
    # docs 1 and 2 MUST share a fingerprint hash despite the offset
    # difference (relocation invariance: positions are not compared)
    assert by_doc[1] & by_doc[2], (by_doc[1], by_doc[2])
    # the unrelated doc shares nothing with either
    assert not (by_doc[3] & (by_doc[1] | by_doc[2]))
    # sub-threshold doc emits nothing
    assert 4 not in by_doc


def test_density_bound(spark, fp_frame):
    sel, _ = fp_frame
    r = {x["doc_id"]: x for x in sel.groupBy("doc_id", "n_shingles")
         .count().collect()}
    for doc_id, row in r.items():
        n_windows = row["n_shingles"] - _WINNOW_W + 1
        # selected fingerprints <= windows, and can't be fewer than
        # ceil(windows / W) (one selection survives at most W windows)
        assert row["count"] <= n_windows
        assert row["count"] >= (n_windows + _WINNOW_W - 1) // _WINNOW_W


def test_winnowing_matches_bruteforce_reference(spark, tmp_path):
    """The Spark selection equals an independently-written pure-python
    winnowing reference (same hash, same window-min-with-lowest-pos
    tie rule) on a corpus with REPEATED tokens (hash ties and repeated
    windows included) — pins the operator against a second
    implementation, not just its own SQL twin."""
    import hashlib

    import numpy as np

    from dataingestiontohana_spark.plans.llm_dedup import (
        _POS_BASE,
        _WINNOW_SALT,
        _WINNOW_W,
        _winnow_selected,
    )

    rng = np.random.default_rng(83)
    vocab = [f"w{i}" for i in range(7)]  # tiny vocab: repeats guaranteed
    rows = []
    for doc_id in range(12):
        n = int(rng.integers(3, 40))
        text = " ".join(vocab[int(k)] for k in rng.integers(0, 7, n))
        rows.append((doc_id, text, "en", "srcA", len(text)))
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    base = tmp_path / "docs"
    df.write.mode("overwrite").parquet(str(base / "documents.parquet"))

    def reference(text):
        toks = text.split()
        shingles = [
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ]
        def h(s):
            return int(
                hashlib.md5(f"{_WINNOW_SALT}:{s}".encode()).hexdigest()[:8],
                16,
            )
        comps = [h(s) * _POS_BASE + p for p, s in enumerate(shingles)]
        out = set()
        for start in range(len(comps) - _WINNOW_W + 1):
            out.add(min(comps[start : start + _WINNOW_W]))
        return out

    got = {}
    for r in _winnow_selected(spark, str(base)).collect():
        got.setdefault(r["doc_id"], set()).add(r["c"])
    want = {
        doc_id: reference(text)
        for doc_id, text, *_ in rows
        if len(text.split()) - 2 >= _WINNOW_W
    }
    assert got == {k: v for k, v in want.items() if v}


def test_hot_fingerprint_cap_bounds_pair_fanout(spark, tmp_path):
    """VERDICT r8 item 6: plant one boilerplate fingerprint (the same
    12-token run pasted into MANY docs — a license header) and assert
    q212's hot-fingerprint guard drops it BEFORE the pair join: the
    pair fan-out stays bounded by the genuinely-similar docs, not the
    quadratic boilerplate blow-up. The cap is a parameter
    (`hot_doc_cap`, default WINNOW_HOT_DOC_CAP): raising it past the
    planted frequency re-admits the boilerplate pairs — proof the
    guard (not luck) bounds the fan-out."""
    from dataingestiontohana_spark.plans.llm_dedup import (
        WINNOW_HOT_DOC_CAP,
        q212_winnow_overlap,
    )

    base = tmp_path / "hotfp"
    base.mkdir()
    boiler = " ".join(f"lic{i}" for i in range(12))  # shared header
    n_boiler = 20  # > the test cap below, << C(20,2)=190 pairs if unguarded
    rows = []
    for d in range(n_boiler):
        # unique body per doc: the ONLY overlap is the planted header
        body = " ".join(f"d{d}w{i}" for i in range(10))
        rows.append((d, boiler + " " + body, "en", "src", 0))
    # one genuinely-duplicated pair with no boilerplate
    dup = " ".join(f"q{i}" for i in range(15))
    rows += [(100, dup, "en", "src", 0), (101, dup + " tail", "en", "src", 0)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(base / "documents.parquet"))

    assert WINNOW_HOT_DOC_CAP == 50  # the documented default

    # cap BELOW the planted frequency: boilerplate fingerprints drop,
    # only the genuine duplicate pair survives
    guarded = q212_winnow_overlap(spark, str(base), hot_doc_cap=10).collect()
    assert [(r["id_a"], r["id_b"]) for r in guarded] == [(100, 101)]

    # cap ABOVE the planted frequency: the quadratic fan-out appears —
    # C(20,2)=190 boilerplate pairs the guard was suppressing
    unguarded = q212_winnow_overlap(
        spark, str(base), hot_doc_cap=n_boiler + 1
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in unguarded}
    assert (100, 101) in pairs
    boiler_pairs = {p for p in pairs if p[0] < n_boiler and p[1] < n_boiler}
    assert len(boiler_pairs) == n_boiler * (n_boiler - 1) // 2
