"""Sink audit: the reference's offset-continuity oracle (SURVEY §5.1,
`/root/reference/README.md:84-99,121-126,158-164`) as a query —
exactly-once <=> rows = distinct keys = key span; gaps mean loss,
rows > distinct means duplicates.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class SinkAudit:
    n_rows: int
    uniq: int
    span: int

    @property
    def has_loss(self) -> bool:
        return self.uniq < self.span

    @property
    def has_duplicates(self) -> bool:
        return self.n_rows > self.uniq

    @property
    def exactly_once(self) -> bool:
        return self.n_rows == self.uniq == self.span


def audit_sink(connection, table: str, key: str = "counter") -> SinkAudit:
    """Run the Q24 audit on a DBAPI connection's sink table."""
    q = (
        f'SELECT COUNT(*), COUNT(DISTINCT "{key}"), '
        f'MAX("{key}") - MIN("{key}") + 1 FROM "{table}"'
    )
    row = connection.execute(q).fetchone()
    return SinkAudit(n_rows=row[0], uniq=row[1], span=row[2])
