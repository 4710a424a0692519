"""Column-expression utilities.

``let`` — a let-binding for Column expressions. Catalyst's project
collapse freely inlines aliased expressions into downstream expressions
(observed: a MinHash signature chain inlined 24 copies of the per-shingle
md5 pass into one projection — a 20x slowdown). Column-level aliases are
therefore NOT a reliable way to share an expensive subexpression. Binding
the value as a higher-order-function lambda variable is: the array
wrapper is evaluated once per row, and every reference inside the body is
a variable lookup, no matter how the optimizer rearranges projections.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once per row; use it any number of times inside
    ``body``. Implemented as ``transform(array(value), v -> body(v))[1]``
    — the single-element array binds the value as a lambda variable."""
    return F.element_at(F.transform(F.array(value), body), 1)
