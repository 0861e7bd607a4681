"""Static lint over the registered DuckDB oracle SQL strings.

Round-5 ADVICE found two oracles whose Knuth rank-hash skipped the
``id % (2^31-1)`` reduction the Spark side applies (identical on fixture
ids < 2^31, silently divergent above) — exactly the overflow class the
round-5 ``_reduced`` change set out to eliminate.  This lint pins the
invariant textually: every ``* 2654435761`` in every oracle must be
applied to an already-reduced operand, i.e. the token immediately before
the multiply must end with ``% 2147483647)``.
"""

from __future__ import annotations

import re

from etl_for_ecol_fusion_database_spark import registry

KNUTH = "2654435761"
#: an operand is reduced iff the text right before "* 2654435761" ends in
#: "% 2147483647)" (possibly with whitespace/newlines between tokens).
#: ANCHORED at the end (\Z) so it must terminate at the multiply under
#: test — a search anywhere in a fixed window could be satisfied by a
#: DIFFERENT, earlier multiply in the same expression, masking an
#: unreduced site (and a long whitespace run could push a valid reduction
#: out of a too-small window, false-flagging it).
_REDUCED_BEFORE = re.compile(r"%\s*2147483647\s*\)\s*\*\s*" + KNUTH + r"\Z")


def test_every_oracle_knuth_multiply_is_reduced_first():
    offenders: list[str] = []
    for name, sql in registry.ORACLES.items():
        for m in re.finditer(r"\*\s*" + KNUTH, sql):
            # the reduced pattern must END at this exact multiply site
            prefix = sql[max(0, m.end() - 200) : m.end()]
            if not _REDUCED_BEFORE.search(prefix):
                offenders.append(f"{name}: ...{prefix[-60:]!r}")
    assert not offenders, (
        "oracle SQL multiplies an un-reduced id by the Knuth constant "
        "(int64 overflow for ids >= 2^31, diverging from Spark's pmod-"
        "reduced hash):\n" + "\n".join(offenders)
    )


def test_every_oracle_knuth_product_is_mod_reduced_after():
    """The product must also be taken mod 2^31-1 (or a bucket count) —
    a bare product would exceed DuckDB's preferred INT32/INT64 display
    ranges differently than Spark's pmod."""
    for name, sql in registry.ORACLES.items():
        for m in re.finditer(r"\*\s*" + KNUTH + r"(?!\d)", sql):
            tail = sql[m.end() : m.end() + 80]
            assert re.match(r"\s*(\)|\+|%)", tail), (
                f"{name}: Knuth product not immediately reduced/combined: {tail!r}"
            )
