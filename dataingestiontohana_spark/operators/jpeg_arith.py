"""Arithmetic-coded JPEG entropy decode (ITU-T T.81 Annexes D and F):
the QM-coder and the sequential-DCT statistical models, pure stdlib.

This closes the repo's longest-standing declared codec boundary:
SOF9 (extended sequential) AND SOF10 (progressive) arithmetic streams
now decode to coefficient blocks that feed the SAME dequant + IDCT +
upsample pipeline as Huffman baseline/progressive
(operators/multimodal.py); the progressive scan modes (DC/AC
first/refine per T.81 G.1.3) reuse the identical QM-coder and
statistics areas.
Correctness is pinned two independent ways (tests/test_jpeg_arith.py):

1. REAL third-party streams: libjpeg-turbo-encoded arithmetic JPEGs
   (committed fixtures, generator source alongside) must decode to
   pixels BIT-IDENTICAL to our own Huffman decode of the matching
   libjpeg Huffman stream of the same image - the entropy layers
   differ, everything downstream is shared, so any QM/model bug
   breaks the equality.
2. The q204 value gate gains arithmetic clips: constant-block mosaics
   (DC-only, unit quantization - exact decode) whose moments the
   DuckDB oracle recomputes from the md5 seed.

Spec provenance (all public):
- Table D.3 probability estimation state machine: Qe, NMPS, NLPS,
  SWITCH per coding state (113 states + the non-adaptive fixed state
  113 used for AC sign decisions, Qe = 0x5A1D with NMPS = NLPS = 113).
- Decoder procedures: INITDEC / DECODE / MPS_EXCHANGE / LPS_EXCHANGE /
  RENORMD / BYTEIN per Annex D.2 (byte-stuffed stream: 0xFF 0x00 is a
  literal 0xFF data byte; any other 0xFF pair is a marker and the
  decoder feeds zero bytes from there on).
- Statistical models: DC difference conditioning (zero/small/large x
  sign contexts from the L/U bounds, 49 bins per table) and AC
  band conditioning (per-K EOB/significance/magnitude triples with
  the Kx low/high magnitude-category split, 245 bins per table) per
  Annex F.1.4.4 / F.2.4, with the DAC marker carrying (L, U) and Kx.

Scale shape: entropy decode is inherently sequential per scan - the
parallel unit is the FILE (mapInPandas batch), exactly like the
Huffman path.
"""

from __future__ import annotations

import numpy as np

# ITU-T T.81 Table D.3: (Qe, NMPS, NLPS, SWITCH) per state. State 113
# is the non-adaptive "fixed" state (AC sign coding).
_ARITAB: tuple[tuple[int, int, int, int], ...] = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0), (0x080B, 4, 18, 0),
    (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0), (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0),
    (0x0036, 9, 30, 0), (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1), (0x3F25, 16, 36, 0),
    (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0), (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0),
    (0x0CEF, 21, 43, 0), (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0), (0x01B1, 28, 54, 0),
    (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0), (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0),
    (0x0068, 33, 62, 0), (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0), (0x2EF1, 40, 67, 0),
    (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0), (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0),
    (0x1177, 45, 73, 0), (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0), (0x04DE, 52, 50, 0),
    (0x040F, 53, 50, 0), (0x0363, 54, 51, 0), (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0),
    (0x01F8, 57, 54, 0), (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0), (0x008F, 32, 61, 0),
    (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0), (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0),
    (0x2FE8, 69, 83, 0), (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0), (0x119C, 76, 74, 0),
    (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0), (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0),
    (0x5832, 81, 80, 1), (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0), (0x2516, 71, 86, 0),
    (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0), (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0),
    (0x3824, 93, 99, 0), (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0), (0x3C3D, 100, 104, 0),
    (0x375E, 93, 99, 0), (0x5231, 102, 105, 0), (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0),
    (0x415E, 99, 103, 0), (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1), (0x5522, 109, 112, 0),
    (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)


class QMDecoder:
    """Annex D.2 arithmetic decoder over a pre-unstuffed entropy
    segment (0xFF 0x00 already collapsed to 0xFF, markers stripped;
    reads past the end feed zero bytes, which is exactly the spec's
    marker-detected behavior)."""

    __slots__ = ("data", "pos", "c", "a", "ct")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        # INITDEC: the code register's high 16 bits hold the first two
        # stream bytes (the encoder starts from interval A = 0x10000,
        # so the decoder does too); the third byte is prefetched into
        # bits 8-15 with CT = 8 shifts before the next byte is due —
        # equivalent to the spec's staggered BYTEIN, since zero-fill
        # past a marker is the same whenever it happens.
        b0 = self._byte()
        b1 = self._byte()
        b2 = self._byte()
        self.c = (b0 << 24) | (b1 << 16) | (b2 << 8)
        self.ct = 8
        self.a = 0x10000

    def _byte(self) -> int:
        p = self.pos
        if p < len(self.data):
            self.pos = p + 1
            return self.data[p]
        return 0

    def decode(self, stats: bytearray, i: int) -> int:
        """DECODE(S) with the estimation state packed per bin as
        (state_index << 1) | MPS."""
        s = stats[i]
        idx = s >> 1
        mps = s & 1
        qe, nmps, nlps, sw = _ARITAB[idx]
        a = self.a - qe
        if (self.c >> 16) < a:
            if a & 0x8000:
                self.a = a
                return mps
            # renorm on the MPS path: conditional exchange (D.16)
            if a < qe:
                d = 1 - mps
                if sw:
                    mps = 1 - mps
                stats[i] = (nlps << 1) | mps
            else:
                d = mps
                stats[i] = (nmps << 1) | mps
        else:
            self.c -= a << 16
            # LPS path: conditional exchange (D.17)
            if a < qe:
                d = mps
                stats[i] = (nmps << 1) | mps
            else:
                d = 1 - mps
                if sw:
                    mps = 1 - mps
                stats[i] = (nlps << 1) | mps
            a = qe
        # RENORMD (D.18) + BYTEIN (D.19)
        c = self.c
        ct = self.ct
        while True:
            if ct == 0:
                c |= self._byte() << 8
                ct = 8
            a <<= 1
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
            if a & 0x8000:
                break
        self.a = a
        self.c = c
        self.ct = ct
        return d


# the fixed (non-adaptive) bin for AC sign decisions: state 113, MPS 0
def _fixed_bin() -> bytearray:
    return bytearray((113 << 1,))


class ArithSequentialDecoder:
    """Sequential-DCT statistical models (F.2.4) over a QMDecoder.

    One instance per restart segment: statistics areas, DC contexts
    and DC predictions all reset at restart boundaries per F.2.4.5."""

    def __init__(
        self,
        segment: bytes,
        dc_cond: dict[int, tuple[int, int]],
        ac_cond: dict[int, int],
        comp_ids: list[int],
    ) -> None:
        self.qm = QMDecoder(segment)
        self.dc_stats = {t: bytearray(64) for t in dc_cond}
        self.ac_stats = {t: bytearray(256) for t in ac_cond}
        self.dc_cond = dc_cond
        self.ac_cond = ac_cond
        self.fixed = _fixed_bin()
        self.dc_context = {cid: 0 for cid in comp_ids}
        self.pred = {cid: 0 for cid in comp_ids}

    def decode_dc_diff(self, cid: int, dc_tbl: int) -> None:
        """One DC difference (F.2.4.1) accumulated into the component
        predictor, conditioning context updated for the next block."""
        qm = self.qm
        st = self.dc_stats[dc_tbl]
        base = self.dc_context[cid]
        low, up = self.dc_cond[dc_tbl]
        if qm.decode(st, base) == 0:
            self.dc_context[cid] = 0
            return
        sign = qm.decode(st, base + 1)
        m = qm.decode(st, base + 2 + sign)
        pos = base + 2 + sign
        if m:
            # magnitude category: X1 bin fixed at 20 (Table F.4)
            pos = 20
            while qm.decode(st, pos):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("arith JPEG: DC magnitude overflow")
                pos += 1
        # conditioning category for the NEXT block (F.1.4.4.1.3)
        if m < ((1 << low) >> 1):
            self.dc_context[cid] = 0
        elif m > ((1 << up) >> 1):
            self.dc_context[cid] = 12 + (sign << 2)
        else:
            self.dc_context[cid] = 4 + (sign << 2)
        v = m
        # mantissa bits share the M bin 14 past the category bin
        pos += 14
        while m := m >> 1:
            if qm.decode(st, pos):
                v |= m
        v += 1
        if sign:
            v = -v
        self.pred[cid] += v

    def decode_ac_band(
        self,
        coef: np.ndarray,
        ac_tbl: int,
        ss: int,
        se: int,
        shift: int = 0,
    ) -> None:
        """AC coefficients over the spectral band [ss, se] (F.2.4.2):
        per-K EOB/significance/magnitude triples; decoded values are
        written (scaled by 2^shift — the progressive Al point
        transform; 0 for sequential) into ``coef`` at ZIGZAG index."""
        qm = self.qm
        st = self.ac_stats[ac_tbl]
        kx = self.ac_cond[ac_tbl]
        k = ss
        while k <= se:
            pos = 3 * (k - 1)
            if qm.decode(st, pos):  # EOB
                break
            while qm.decode(st, pos + 1) == 0:
                k += 1
                pos += 3
                if k > se:
                    raise ValueError("arith JPEG: AC run past band end")
            sign = qm.decode(self.fixed, 0)
            pos += 2
            m = qm.decode(st, pos)
            if m:
                if qm.decode(st, pos):
                    m = 2
                    pos = 189 if k <= kx else 217
                    while qm.decode(st, pos):
                        m <<= 1
                        if m == 0x8000:
                            raise ValueError(
                                "arith JPEG: AC magnitude overflow"
                            )
                        pos += 1
            v = m
            pos += 14
            while m := m >> 1:
                if qm.decode(st, pos):
                    v |= m
            v += 1
            if sign:
                v = -v
            coef[k] = v << shift if v >= 0 else -((-v) << shift)
            k += 1

    def decode_block(self, cid: int, dc_tbl: int, ac_tbl: int) -> np.ndarray:
        """One 8x8 block -> 64 coefficients in ZIGZAG order."""
        coef = np.zeros(64, dtype=np.int32)
        self.decode_dc_diff(cid, dc_tbl)
        coef[0] = self.pred[cid]
        self.decode_ac_band(coef, ac_tbl, 1, 63)
        return coef

    # -- progressive scan modes (T.81 G.1.3 with arithmetic coding;
    # the Huffman progressive machinery accumulates the same `coefs`
    # arrays, so these four methods are the only arithmetic-specific
    # parts of SOF10 decode) --------------------------------------

    def dc_first(self, arr: np.ndarray, cid: int, dc_tbl: int, al: int) -> None:
        """DC first scan (Ah=0): the sequential DC model; the
        predictor accumulates UNSHIFTED diffs, the block stores the
        point-transformed value (<< Al)."""
        self.decode_dc_diff(cid, dc_tbl)
        arr[0] = self.pred[cid] << al

    def dc_refine(self, arr: np.ndarray, al: int) -> None:
        """DC refinement scan (Ah>0): one fixed-bin bit per block,
        ORed in at Al (two's complement makes that exact for
        negatives, as in the Huffman path)."""
        if self.qm.decode(self.fixed, 0):
            arr[0] = int(arr[0]) | (1 << al)

    def ac_first(self, arr: np.ndarray, ac_tbl: int, ss: int, se: int, al: int) -> None:
        """AC first scan (Ah=0): the band model at point transform Al."""
        self.decode_ac_band(arr, ac_tbl, ss, se, shift=al)

    def ac_refine(self, arr: np.ndarray, ac_tbl: int, ss: int, se: int, al: int) -> None:
        """AC refinement scan (Ah>0) per G.1.3.3: correction bits for
        previously-nonzero coefficients, newly-significant bits with
        fixed-bin signs; the EOB decision applies only past EOBx (the
        highest index established by previous scans)."""
        qm = self.qm
        st = self.ac_stats[ac_tbl]
        p1 = 1 << al
        m1 = -p1
        kex = se
        while kex > 0 and int(arr[kex]) == 0:
            kex -= 1
        k = ss
        while k <= se:
            pos = 3 * (k - 1)
            if k > kex:
                if qm.decode(st, pos):  # EOB
                    break
            while True:
                c = int(arr[k])
                if c:
                    if qm.decode(st, pos + 2):
                        arr[k] = c + (m1 if c < 0 else p1)
                    break
                if qm.decode(st, pos + 1):
                    arr[k] = m1 if qm.decode(self.fixed, 0) else p1
                    break
                pos += 3
                k += 1
                if k > se:
                    raise ValueError(
                        "arith JPEG: AC refinement past band end"
                    )
            k += 1


def split_entropy_segments(b: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff the entropy-coded data beginning at ``start``: 0xFF 0x00
    collapses to a 0xFF data byte, RSTn markers split segments, any
    other marker terminates. Returns (segments, index of the
    terminating marker's 0xFF)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(b)
    while i < n:
        v = b[i]
        if v != 0xFF:
            cur.append(v)
            i += 1
            continue
        nxt = b[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
            continue
        if 0xD0 <= nxt <= 0xD7:  # restart: new segment, new coder
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
            continue
        break
    segs.append(bytes(cur))
    return segs, i


# -- encoder (round 11) ------------------------------------------------
#
# The QM ENCODER: the exact dual of QMDecoder above, derived from the
# same Annex D interval arithmetic (Table D.3 state machine, MPS
# subinterval at the bottom, conditional exchange when A - Qe < Qe,
# CLEARBITS + two-byte FLUSH). Its existence unlocks HONEST fixtures
# for arithmetic scan layouts no third-party generator here can emit
# (libjpeg has no Ns-subset arithmetic mode): the encoder is pinned by
# round-tripping through the decoder that is ITSELF pinned bit-exact
# against committed libjpeg-turbo streams, and by the q204 value gate
# (constant-block mosaics at unit quantization decode exactly, so the
# DuckDB oracle adjudicates every encoded pixel).


class QMEncoder:
    """Annex D.1 arithmetic encoder emitting UNSTUFFED bytes — the
    caller inserts the 0x00 after each 0xFF data byte when assembling
    the JPEG stream (the inverse of `split_entropy_segments`). Carry
    propagation rides the unstuffed buffer (a run of 0xFF wraps to
    0x00 while the carry moves left), which is equivalent to the
    spec's stacked-byte formulation."""

    __slots__ = ("out", "c", "a", "ct")

    def __init__(self) -> None:
        self.out = bytearray()
        self.c = 0
        self.a = 0x10000
        self.ct = 11

    def _carry(self) -> None:
        j = len(self.out) - 1
        while j >= 0 and self.out[j] == 0xFF:
            self.out[j] = 0
            j -= 1
        if j < 0:
            # cannot occur: C < 2^27 before the first BYTEOUT (CT
            # starts at 11, so at most 16 interval bits precede it)
            raise ValueError("QM encoder: carry before first byte")
        self.out[j] += 1

    def code(self, stats: bytearray, i: int, d: int) -> None:
        """CODE(S, D): the dual of QMDecoder.decode — identical state
        transitions, interval updates mirrored (the decoder SUBTRACTS
        the low-interval size from C when the value lies in the upper
        subinterval; the encoder ADDS it when coding a decision that
        lives there)."""
        s = stats[i]
        idx = s >> 1
        mps = s & 1
        qe, nmps, nlps, sw = _ARITAB[idx]
        a = self.a - qe
        if d == mps:
            if a & 0x8000:
                self.a = a
                return
            if a < qe:  # conditional exchange: MPS takes the Qe slot
                self.c += a
                a = qe
            stats[i] = (nmps << 1) | mps
        else:
            if a >= qe:  # no exchange: LPS takes the Qe slot on top
                self.c += a
                a = qe
            if sw:
                mps = 1 - mps
            stats[i] = (nlps << 1) | mps
        # RENORME + BYTEOUT (bits 19-26 emitted every 8 shifts)
        c = self.c
        ct = self.ct
        out = self.out
        while True:
            a <<= 1
            c <<= 1
            ct -= 1
            if ct == 0:
                t = c >> 19
                if t > 0xFF:
                    self._carry()
                    t &= 0xFF
                out.append(t)
                c &= 0x7FFFF
                ct = 8
            if a & 0x8000:
                break
        self.a = a
        self.c = c
        self.ct = ct

    def flush(self) -> bytes:
        """CLEARBITS + FLUSH (D.1.8): pick the code value with the
        most trailing zeros inside the final interval [C, C+A), emit
        the last two bytes, drop redundant trailing zeros (the decoder
        zero-fills past the end anyway)."""
        t = (self.c + self.a - 1) & ~0xFFFF
        self.c = t + 0x8000 if t < self.c else t
        c = self.c << self.ct
        for _ in range(2):
            t2 = c >> 19
            if t2 > 0xFF:
                self._carry()
                t2 &= 0xFF
            self.out.append(t2)
            c = (c & 0x7FFFF) << 8
        while self.out and self.out[-1] == 0:
            self.out.pop()
        return bytes(self.out)


class ArithSequentialEncoder:
    """Sequential-DCT statistical models (F.1.4.4) over a QMEncoder —
    the decision-for-decision dual of ArithSequentialDecoder: same
    statistics areas, same conditioning contexts, same category/
    mantissa trees, so a decode of the emitted segment replays the
    identical bin sequence. One instance per restart segment."""

    def __init__(
        self,
        dc_cond: dict[int, tuple[int, int]],
        ac_cond: dict[int, int],
        comp_ids: list[int],
    ) -> None:
        self.qm = QMEncoder()
        self.dc_stats = {t: bytearray(64) for t in dc_cond}
        self.ac_stats = {t: bytearray(256) for t in ac_cond}
        self.dc_cond = dc_cond
        self.ac_cond = ac_cond
        self.fixed = _fixed_bin()
        self.dc_context = {cid: 0 for cid in comp_ids}
        self.pred = {cid: 0 for cid in comp_ids}

    def encode_dc_diff(self, cid: int, dc_tbl: int, diff: int) -> None:
        qm = self.qm
        st = self.dc_stats[dc_tbl]
        base = self.dc_context[cid]
        low, up = self.dc_cond[dc_tbl]
        if diff == 0:
            qm.code(st, base, 0)
            self.dc_context[cid] = 0
            return
        qm.code(st, base, 1)
        sign = 1 if diff < 0 else 0
        qm.code(st, base + 1, sign)
        sz = abs(diff) - 1
        pos = base + 2 + sign
        m = 0
        if sz == 0:
            qm.code(st, pos, 0)
        else:
            qm.code(st, pos, 1)
            pos = 20
            m = 1
            while (m << 1) <= sz:
                if (m << 1) == 0x8000:
                    raise ValueError("arith JPEG: DC diff too large")
                qm.code(st, pos, 1)
                m <<= 1
                pos += 1
            qm.code(st, pos, 0)
        if m < ((1 << low) >> 1):
            self.dc_context[cid] = 0
        elif m > ((1 << up) >> 1):
            self.dc_context[cid] = 12 + (sign << 2)
        else:
            self.dc_context[cid] = 4 + (sign << 2)
        pos += 14
        bit = m >> 1
        while bit:
            qm.code(st, pos, 1 if (sz & bit) else 0)
            bit >>= 1
        self.pred[cid] += diff

    def encode_ac_band(
        self, coef: np.ndarray, ac_tbl: int, ss: int, se: int
    ) -> None:
        qm = self.qm
        st = self.ac_stats[ac_tbl]
        kx = self.ac_cond[ac_tbl]
        last = ss - 1
        for k in range(ss, se + 1):
            if int(coef[k]) != 0:
                last = k
        k = ss
        while k <= se:
            pos = 3 * (k - 1)
            if k > last:
                qm.code(st, pos, 1)  # EOB
                return
            qm.code(st, pos, 0)
            while int(coef[k]) == 0:
                qm.code(st, pos + 1, 0)
                k += 1
                pos += 3
            qm.code(st, pos + 1, 1)
            v = int(coef[k])
            qm.code(self.fixed, 0, 1 if v < 0 else 0)
            sz = abs(v) - 1
            pos += 2
            m = 0
            if sz == 0:
                qm.code(st, pos, 0)
            elif sz == 1:
                qm.code(st, pos, 1)
                qm.code(st, pos, 0)  # second decision, SAME bin
                m = 1
            else:
                qm.code(st, pos, 1)
                qm.code(st, pos, 1)
                pos = 189 if k <= kx else 217
                m = 2
                while (m << 1) <= sz:
                    if (m << 1) == 0x8000:
                        raise ValueError("arith JPEG: AC coef too large")
                    qm.code(st, pos, 1)
                    m <<= 1
                    pos += 1
                qm.code(st, pos, 0)
            pos += 14
            bit = m >> 1
            while bit:
                qm.code(st, pos, 1 if (sz & bit) else 0)
                bit >>= 1
            k += 1

    def encode_block(
        self, cid: int, dc_tbl: int, ac_tbl: int, coef: np.ndarray
    ) -> None:
        """One 8x8 block of ZIGZAG-ordered quantized coefficients."""
        self.encode_dc_diff(cid, dc_tbl, int(coef[0]) - self.pred[cid])
        self.encode_ac_band(coef, ac_tbl, 1, 63)

    def flush(self) -> bytes:
        return self.qm.flush()


def stuff_entropy(raw: bytes) -> bytes:
    """Insert the 0x00 stuffing byte after each 0xFF data byte — the
    inverse of `split_entropy_segments`' unstuffing."""
    return raw.replace(b"\xff", b"\xff\x00")
