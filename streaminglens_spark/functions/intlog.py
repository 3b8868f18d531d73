"""Integer fixed-point base-2 logarithm -- the engine-exact primitive that
makes *log-weighted* corpus operators (BM25 relevance, language-model
surprisal) hash-checkable across engines (round-5 continued extension).

Every ranking/scoring operator the LLM-data stack wants eventually needs a
logarithm (idf weights, cross-entropy, information content), and ``ln`` is
the one place the repo's determinism rules would otherwise break: neither
Java's ``Math.log`` nor a C libm guarantees correctly-rounded results, so
two engines can disagree in the last ulp and a value-hash comparison dies.
The fix mirrors the repo's integer-arithmetic convention (see
``sampling.mixture_sample``): define the TRANSFORM itself in pure integer
ops so any engine computes bit-identical values.

``log2_fp(n)`` for a positive BIGINT ``n`` returns micro-bits (1e6 = one
bit):

- ``flog  = floor(log2(n))`` -- the bit length of ``n`` minus one, taken
  from the binary string rendering (``bin`` exists in both Spark and
  DuckDB; no floats);
- ``idx   =`` the top 7 bits of ``n`` (shift by ``flog - 6``), an integer
  in ``[64, 127]`` whose low 6 bits index a 64-entry lookup table of
  ``round(log2(1 + i/64) * 1e6)`` -- a plan literal in both engines;
- ``log2_fp(n) = flog * 1e6 + LUT[idx - 64]``.

The result equals ``log2(n)`` quantized by mantissa truncation: absolute
error < ``log2(1 + 1/64) ~= 0.0224`` bits (+-5e-7 from LUT rounding).
That is far more resolution than ranking weights need (Lucene stores
BM25 norms in 8 bits total), and unlike a float log the value is a pure
function of ``n`` -- identical on any engine, any libm, any CPU.

``dec_div(a, b)`` is the companion: exact floor division for non-negative
``decimal(38,0)`` operands.  Spark's ``div`` operator casts decimals to
long internally and silently overflows past 2^63 (measured: a 27-digit
decimal ``div 97`` returns a negative long), and plain decimal ``/``
rounds HALF_UP at scale 6 -- ``floor`` of that overshoots by one when the
true remainder is within 5e-7 of the divisor.  ``dec_div`` takes the
rounded quotient and corrects it with one exact multiply-subtract
(products stay under 38 digits by the caller's contract), so the result
is the true mathematical floor -- matching DuckDB's exact ``HUGEINT //``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

FP_ONE = 1_000_000  # micro-bits per bit

#: round(log2(1 + i/64) * 1e6) for i in 0..63 -- identical literal in the
#: Spark plan and the DuckDB oracle SQL (rendered by :func:`lut_sql`).
LOG2_LUT = [round(math.log2(1 + i / 64) * FP_ONE) for i in range(64)]


def lut_sql() -> str:
    """The LUT as a DuckDB list literal (1-indexed with ``[idx]``)."""
    return "[" + ", ".join(str(v) for v in LOG2_LUT) + "]"


def log2_fp(n: Column) -> Column:
    """Micro-bit ``log2`` of a positive integral column (LONG result).

    Precondition: ``n >= 1`` (callers pass counts shifted by +1 or odd
    ``2k+1`` forms, which are >= 1 by construction).  ``bin``/shift/LUT
    only -- no floating point anywhere.
    """
    n = n.cast("long")
    flog = (F.length(F.bin(n)) - 1).cast("int")
    # top 7 bits of n: in [64, 127]; variable shift via call_function
    # (the python F.shiftright wrapper only accepts literal shift counts)
    idx = (
        F.when(flog >= 6, F.call_function("shiftright", n, flog - F.lit(6)))
        .otherwise(F.call_function("shiftleft", n, F.lit(6) - flog))
        .cast("int")
        - 64
    )
    lut = F.array(*[F.lit(v) for v in LOG2_LUT])
    return flog.cast("long") * FP_ONE + F.element_at(lut, idx + 1).cast("long")


def log2_fp_sql(expr: str) -> str:
    """The identical transform as DuckDB SQL over an integral expression
    (kept textually parallel to :func:`log2_fp`; ``expr`` is substituted
    verbatim, so pass a simple column/paren expression)."""
    return (
        f"((length(bin(CAST({expr} AS BIGINT))) - 1)::BIGINT * {FP_ONE}"
        f" + ({lut_sql()})["
        f"(CASE WHEN length(bin(CAST({expr} AS BIGINT))) - 1 >= 6"
        f" THEN CAST({expr} AS BIGINT) >> (length(bin(CAST({expr} AS BIGINT))) - 7)"
        f" ELSE CAST({expr} AS BIGINT) << (7 - length(bin(CAST({expr} AS BIGINT))))"
        f" END)::INT - 63]::BIGINT)"
    )


_DEC = "decimal(38,0)"


def dec(x) -> Column:
    """Cast a column/literal to ``decimal(38,0)`` (exact integer lane)."""
    return (x if isinstance(x, Column) else F.lit(x)).cast(_DEC)


def dec_div(a: Column, b: Column) -> Column:
    """Exact floor division of non-negative ``decimal(38,0)`` columns.

    Contract (ADVICE r5 tightening): ``a, b >= 0``, ``b > 0``, the TRUE
    QUOTIENT ``a div b`` must be ``< 10^32``, and ``q0 * b`` must fit 38
    digits (so the correction product stays exact).  The quotient bound
    is load-bearing, not cosmetic: Spark resolves
    ``decimal(38,0) / decimal(38,0)`` to ``decimal(38,6)`` -- 32 integer
    digits -- so a quotient >= 10^32 silently overflows ``a / b`` to NULL
    even when ``a`` and ``b`` individually fit 38 digits (e.g.
    ``a = 10^37, b = 2``).  Callers here divide by corpus-sized counts
    or fixed-point scale factors, keeping quotients far below the bound.
    See the module docstring for why neither ``div`` nor
    ``floor(a / b)`` is safe."""
    q0 = F.floor(a / b).cast(_DEC)
    # HALF_UP at scale 6 can overshoot the true quotient by one; one exact
    # multiply-subtract detects it.  It can never undershoot (rounding a
    # value up to the next integer requires frac >= 0.9999995 > 0).
    return F.when(a - q0 * b < 0, q0 - 1).otherwise(q0)
