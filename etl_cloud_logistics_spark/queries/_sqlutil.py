"""Portable SQL fragments shared by the DuckDB oracle strings.

Why this exists: round 5's driver run flipped `temperature_mixture_sources`
to hash-mismatch even though the answer is bit-exact locally — the oracle
was the only green-candidate leaning on DuckDB's nonstandard
``CAST('0x' || hex AS BIGINT)`` hex literal cast AND emitting a raw
unrounded double.  Oracles must survive any DuckDB version the driver
ships, so every construct here is plain ANSI arithmetic/string functions
(strpos/substr/multiply/add) that cannot drift between releases.
"""

from __future__ import annotations


def hex_prefix_bigint(expr: str, nchars: int) -> str:
    """SQL expression reading the first ``nchars`` lowercase-hex characters
    of string expression ``expr`` as a BIGINT, positionally (big-endian),
    using only ANSI string/arith functions — the portable replacement for
    DuckDB's version-sensitive ``('0x' || h)::BIGINT``.

    ``nchars <= 15`` keeps the value < 16^15 ≈ 1.15e18, inside BIGINT.
    ``expr`` is re-evaluated per character — call sites hoist the hashed
    string into a named column first so md5 runs once per row.
    """
    if not (1 <= nchars <= 15):
        raise ValueError("nchars must be in 1..15 to stay inside BIGINT")
    terms = [
        f"(strpos('0123456789abcdef', substr({expr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (nchars - 1 - i)}"
        for i in range(nchars)
    ]
    return "(" + "\n             + ".join(terms) + ")"
