"""IDN host folding (round 10): internationalized hostnames collapse
onto their ASCII-Compatible-Encoding (ACE) form — ``bücher.example``
and ``xn--bcher-kva.example`` are the SAME host to DNS, so crawl-side
URL identity must fold them together (the r9 verdict's remaining URL
canonicalization gap).

`punycode_encode` is implemented from RFC 3492 directly (the
bootstring algorithm with the Appendix-B parameter set) and pinned in
pytest against CPython's independent ``punycode`` codec over random
label corpora — the GIF/codec discipline: our own implementation,
adjudicated against a third-party one.

Folding contract (`ace_host`): lowercase the host (simple case fold —
the overwhelmingly common normalization; full IDNA2008/UTS-46 mapping
tables are out of scope and DOCUMENTED as such), split on '.', leave
ASCII labels as-is (including already-encoded ``xn--`` labels, which
makes the fold idempotent), encode non-ASCII labels as
``'xn--' + punycode``.

Scale shape: punycode runs in Python, so the operator gates it behind
an ASCII fast path — hosts are overwhelmingly ASCII in real crawls,
and the plan splits ASCII rows (pure codegen, zero Python) from the
non-ASCII residue (Arrow-batched pandas UDF, map-only). See
`plans/ingestion.py::q222_idn_host` for the two-frame shape.
"""

from __future__ import annotations

# RFC 3492 §5 parameter values for Punycode
_BASE = 36
_TMIN, _TMAX = 1, 26
_SKEW, _DAMP = 38, 700
_INITIAL_BIAS = 72
_INITIAL_N = 128


def _adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    """RFC 3492 §6.1 bias adaptation."""
    delta = delta // _DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((_BASE - _TMIN) * _TMAX) // 2:
        delta //= _BASE - _TMIN
        k += _BASE
    return k + (((_BASE - _TMIN + 1) * delta) // (delta + _SKEW))


def _digit(d: int) -> str:
    """0-25 -> a-z, 26-35 -> 0-9 (lowercase — the fold lowercases
    first, so no case annotation is ever needed)."""
    return chr(d + 97) if d < 26 else chr(d + 22)


def punycode_encode(label: str) -> str:
    """RFC 3492 §6.3 encoding of one label (WITHOUT the xn-- prefix;
    basic code points are the ASCII subset)."""
    basic = [c for c in label if ord(c) < 128]
    out = list(basic)
    if basic:
        out.append("-")
    h = b = len(basic)
    n, delta, bias = _INITIAL_N, 0, _INITIAL_BIAS
    codepoints = [ord(c) for c in label]
    total = len(codepoints)
    while h < total:
        m = min(cp for cp in codepoints if cp >= n)
        delta += (m - n) * (h + 1)
        n = m
        for cp in codepoints:
            if cp < n:
                delta += 1
            elif cp == n:
                q = delta
                k = _BASE
                while True:
                    t = (
                        _TMIN
                        if k <= bias
                        else (_TMAX if k >= bias + _TMAX else k - bias)
                    )
                    if q < t:
                        break
                    out.append(_digit(t + (q - t) % (_BASE - t)))
                    q = (q - t) // (_BASE - t)
                    k += _BASE
                out.append(_digit(q))
                bias = _adapt(delta, h + 1, h == b)
                delta = 0
                h += 1
        delta += 1
        n += 1
    return "".join(out)


def ace_host(host: str) -> str:
    """Host -> ACE form: lowercase, per-label punycode for non-ASCII
    labels. Idempotent (ASCII output folds to itself)."""
    out = []
    for label in host.lower().split("."):
        if all(ord(c) < 128 for c in label):
            out.append(label)
        else:
            out.append("xn--" + punycode_encode(label))
    return ".".join(out)
