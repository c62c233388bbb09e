"""Shared-frame cache discipline (r8 verdict item 9): every
process-level `_*_CACHE` dict in the package must be covered by
`bench.clear_shared_caches()` — a cache that escapes the bench's
cold-state reset silently warms whichever shared_cost_groups entry
runs second. The bench discovers caches by import scan, so this test
pins (a) the scan finds the known population, (b) clearing empties
every discovered cache, (c) a module-level audit finds no cache-like
global the scan's naming rule would miss."""

from __future__ import annotations

import importlib
import pkgutil
import re

import bench
import dataingestiontohana_spark as pkg

KNOWN = {
    "plans.graph._GRAPH_CACHE",
    "plans.llm_dedup._EDGE_CACHE",
    "plans.llm_dedup._LSH_CACHE",
    "plans.llm_dedup._WINNOW_CACHE",
    "plans.llm_similarity._PROBE_BC",
    "plans.multimodal._AHASH_CACHE",
    "plans.multimodal._DHASH_CACHE",
    "plans.multimodal._JPEG_CACHE",
    "plans.multimodal._MEDIA_CACHE",
    "plans.multimodal._PNG16_CACHE",
    "plans.multimodal._PNG_CACHE",
    "plans.multimodal._WAV_CACHE",
    "plans.relational_ext._BASKET_CACHE",
}


def _short(name: str) -> str:
    return name.removeprefix("dataingestiontohana_spark.")


def test_scan_finds_known_population():
    found = {_short(k) for k in bench.shared_caches()}
    # every known cache is discovered; NEW caches may appear (that is
    # the point — they are auto-covered), but none may vanish silently
    assert KNOWN <= found, KNOWN - found


def test_clear_empties_every_discovered_cache():
    caches = bench.shared_caches()
    for c in caches.values():
        c["sentinel"] = object()
    bench.clear_shared_caches()
    assert all(not c for c in bench.shared_caches().values())


def test_no_cache_like_global_evades_the_naming_rule():
    """A dict global that LOOKS like a shared cache (module-level,
    private, 'cache'/'memo' in the name, any casing) but misses the
    scan's `_*_CACHE` / `_PROBE_BC` rule would silently skew bench
    groups. Sweep every module for such names."""
    covered = {id(v) for v in bench.shared_caches().values()}
    suspicious = []
    pat = re.compile(r"(cache|memo)", re.IGNORECASE)
    for info in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        mod = importlib.import_module(info.name)
        for gname, val in vars(mod).items():
            if not isinstance(val, dict) or not pat.search(gname):
                continue
            if id(val) not in covered:
                suspicious.append(f"{info.name}.{gname}")
    assert not suspicious, (
        "cache-like dict globals not covered by bench.clear_shared_caches "
        f"(rename to _*_CACHE or clear explicitly): {suspicious}"
    )
