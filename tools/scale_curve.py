"""Measured scale curves for the dedup quartet (r11 verdict item 7).

The 100x-scale story for q22_29 / q30_31 / q32_70 / q66_141 was plan-
shape argument plus sf0.1 measurements; this script MEASURES the
scaling exponent by running the exact bench bundles over 1x / 3x / 10x
document corpora and recording wall-clock AND shuffle bytes (the
quantity that actually melts a cluster when an operator is
super-linear).

Corpus construction (the part that decides whether the measurement is
honest): copy k of the sf0.1 documents table caesar-rotates every
letter by k and offsets doc_id by k*10^7. Within a copy, every
duplicate/near-duplicate relation of the original survives verbatim
(one bijective character map applied to both sides), so the per-copy
duplicate-pair DENSITY matches sf0.1; across copies the rotation makes
shingles/minhashes/simhashes disjoint, so pair counts grow ~linearly
in K. (Naively replicating text would instead grow cross-copy
candidate pairs ~K^2 per bucket — a skew stress test, not a scale-up.)
Every other table is copied verbatim.

Shuffle bytes come from the Spark UI REST API (/api/v1/.../stages),
enabled just for this script; per-bundle deltas of the completed-stage
totals. Usage:

    python tools/scale_curve.py [--scales 1,3,10] [--out SCALE_CURVE.json]

Prints one JSON line; exit 0 always (measurement, not a gate).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUARTET = (
    "q22_29_exact_dedup",
    "q30_31_lsh_neardup",
    "q32_70_shingle_exact",
    "q66_141_graph",
    # r12 (verdict item 4): the similarity and media families get
    # measured curves too. q33_34/q35_36b scale over the sign-flipped
    # embeddings copies (see build_scaled_dir); q37_38's synthetic
    # codec fixtures are size-fixed, so like q66_141 its curve
    # measures the document-driven members plus a fixed-cost floor —
    # read the exponent accordingly.
    "q33_34_similarity",
    "q35_36b_ann",
    "q37_38_media",
)
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
UI_PORT = 40411


def build_scaled_dir(base_sf: str, k: int, root: str) -> str:
    """Materialize the Kx corpus directory (idempotent)."""
    import duckdb

    out = os.path.join(root, f"x{k}")
    marker = os.path.join(out, "_built")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src = os.path.join(base_sf, f"{t}.parquet")
        if t not in ("documents", "embeddings") and os.path.exists(src):
            shutil.copyfile(src, os.path.join(out, f"{t}.parquet"))
    con = duckdb.connect()
    # caesar-rotate a-z and A-Z by k per copy; digits/punct unchanged.
    # SQL-side so the build is one vectorized pass even at 50k rows.
    rot = (
        "translate(text, "
        "'abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ', "
        "substr('abcdefghijklmnopqrstuvwxyz', 1 + ({k} % 26)) || "
        "substr('abcdefghijklmnopqrstuvwxyz', 1, ({k} % 26)) || "
        "substr('ABCDEFGHIJKLMNOPQRSTUVWXYZ', 1 + ({k} % 26)) || "
        "substr('ABCDEFGHIJKLMNOPQRSTUVWXYZ', 1, ({k} % 26)))"
    )
    parts = [
        "SELECT doc_id + {off} AS doc_id, {rot} AS text, lang, source,"
        " n_chars FROM src".format(
            off=i * 10_000_000, rot=rot.format(k=i)
        )
        for i in range(k)
    ]
    con.execute(
        "CREATE VIEW src AS SELECT * FROM read_parquet('{p}')".format(
            p=os.path.join(base_sf, "documents.parquet")
        )
    )
    con.execute(
        "COPY ({q}) TO '{dst}' (FORMAT PARQUET)".format(
            q=" UNION ALL ".join(parts),
            dst=os.path.join(out, "documents.parquet"),
        )
    )
    # embeddings scale by SIGN-FLIP copies (r12): copy k multiplies
    # each vector element-wise by a deterministic ±1 pattern s_k —
    # an ORTHOGONAL transform, so cos(s⊙a, s⊙b) == cos(a, b) exactly
    # and every within-copy neighbor relation survives verbatim
    # (per-copy result DENSITY matches the base corpus), while
    # cross-copy pairs scramble like random directions. The honest
    # embedding analog of the caesar rotation: result counts grow
    # ~linearly in K, never ~K^2.
    eparts = [
        (
            "SELECT vec_id + {off} AS vec_id, "
            "list_transform(embedding, (x, i) -> CAST(x * (CASE WHEN "
            "{k} = 0 OR (hash({k} * 1000003 + i) & 1) = 0 "
            "THEN 1 ELSE -1 END) AS FLOAT)) AS embedding, label "
            "FROM esrc"
        ).format(off=i * 10_000_000, k=i)
        for i in range(k)
    ]
    con.execute(
        "CREATE VIEW esrc AS SELECT * FROM read_parquet('{p}')".format(
            p=os.path.join(base_sf, "embeddings.parquet")
        )
    )
    con.execute(
        "COPY ({q}) TO '{dst}' (FORMAT PARQUET)".format(
            q=" UNION ALL ".join(eparts),
            dst=os.path.join(out, "embeddings.parquet"),
        )
    )
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return out


def _stage_totals(spark) -> tuple[int, int, int]:
    """(shuffle_read, shuffle_write, input) bytes summed over completed
    stages, from the UI REST API. The base URL comes from the session
    (r11 review: a busy port makes Spark bind UI_PORT+1 and a
    hardcoded URL would query the wrong or no app)."""
    app_id = spark.sparkContext.applicationId
    ui = spark.sparkContext.uiWebUrl
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.load(r)
    rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
    wr = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    inp = sum(s.get("inputBytes", 0) for s in stages)
    return rd, wr, inp


def _settled_stage_totals(spark) -> tuple[int, int, int]:
    """Stage totals after the UI listener DRAINS: the REST store lags
    the action's return, so a snapshot taken immediately attributes a
    bundle's tail stages to the NEXT bundle's delta (r12: q33_34's
    input bytes showed up in q35_36b's cell). Poll until two
    consecutive reads agree."""
    prev = _stage_totals(spark)
    for _ in range(20):
        time.sleep(0.25)
        cur = _stage_totals(spark)
        if cur == prev:
            return cur
        prev = cur
    return prev


def run_quartet(spark, sf_dir: str) -> dict:
    from bench import clear_shared_caches, materialize
    from dataingestiontohana_spark.plans.bundles import BUNDLES
    from dataingestiontohana_spark.plans import QUERIES as FINE

    clear_shared_caches()
    out = {}
    for bundle in QUARTET:
        r0, w0, i0 = _settled_stage_totals(spark)
        t0 = time.perf_counter()
        for fine in BUNDLES[bundle]:
            materialize(FINE[fine](spark, sf_dir))
        sec = round(time.perf_counter() - t0, 3)
        r1, w1, i1 = _settled_stage_totals(spark)
        out[bundle] = {
            "sec": sec,
            "shuffle_read_mb": round((r1 - r0) / 1e6, 2),
            "shuffle_write_mb": round((w1 - w0) / 1e6, 2),
            # r12: input bytes prove a flat-shuffle bundle's SCAN
            # really grew — the map-only claim needs both numbers
            "input_read_mb": round((i1 - i0) / 1e6, 2),
        }
    return out


def main() -> None:
    scales = [1, 3, 10]
    if "--scales" in sys.argv:
        scales = [
            int(x)
            for x in sys.argv[sys.argv.index("--scales") + 1].split(",")
        ]
    out_path = "SCALE_CURVE.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    base_sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    root = os.environ.get("SPARK_GRAFT_SCALE_ROOT", "/tmp/scale_curve")
    os.makedirs(root, exist_ok=True)

    from dataingestiontohana_spark.session import get_spark

    spark = get_spark(
        "scale-curve",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            # r12: a full 7-bundle x 3-scale run passes ~2000 stages;
            # the default retainedStages=1000 EVICTS early stages and
            # the completed-stage totals go backwards — negative
            # per-bundle deltas (seen live at x10). Retain them all.
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    doc = {"base_sf": base_sf, "scales": {}}
    for k in scales:
        sf_dir = base_sf if k == 1 else build_scaled_dir(base_sf, k, root)
        doc["scales"][str(k)] = run_quartet(spark, sf_dir)
        print(f"scale x{k}: done", file=sys.stderr)
    # scaling exponents between the smallest and largest scale
    k0, k1 = str(scales[0]), str(scales[-1])
    import math

    ratio = scales[-1] / scales[0]
    doc["exponents"] = {}
    for bundle in QUARTET if ratio > 1 else ():
        a, b = doc["scales"][k0][bundle], doc["scales"][k1][bundle]
        doc["exponents"][bundle] = {
            m: round(
                math.log(max(b[m], 1e-9) / max(a[m], 1e-9))
                / math.log(ratio),
                3,
            )
            for m in ("sec", "shuffle_read_mb", "shuffle_write_mb",
                      "input_read_mb")
        }
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print(json.dumps(doc))
    spark.stop()


if __name__ == "__main__":
    main()
